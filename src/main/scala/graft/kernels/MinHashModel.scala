package graft.kernels

import java.util.Random

/** MinHash (Jaccard LSH) signature model.
  *
  * Faithful re-implementation of the reference's math —
  * `/root/reference/elastiknn-models/src/main/java/com/klibisz/elastiknn/models/JaccardLshModel.java:27-63`:
  *   - parameters `A[L*k]`, `B[L*k]` drawn as `rng.nextInt(HASH_PRIME - 1)`
  *     from a `java.util.Random(seed)` (the reference always seeds 0 via its
  *     `ModelCache.scala:17-21` — determinism by seed, never stored state);
  *   - per-element hash `((1 + ti) * a + b) % HASH_PRIME` with
  *     `HASH_PRIME = 2038074743` (`HashingModel.java:5`), evaluated in
  *     *32-bit int arithmetic including Java overflow semantics* so our
  *     minima equal the reference's bit-for-bit on identical input sets;
  *   - per table (band) the hash is the concatenation of the k minima,
  *     prefixed by the table index (`writeIntsWithPrefix(ixL, ints)`,
  *     `JaccardLshModel.java:59`) — here mixed into one Long instead of a
  *     byte array (information-equivalent, shuffle-friendlier);
  *   - the empty set hashes to the sentinel `HASH_PRIME`
  *     (`JaccardLshModel.java:43-45`), so empty documents all land in the
  *     same buckets and are mutual duplicate candidates.
  *
  * Inputs are 64-bit shingle hashes; each is folded to a 32-bit value before
  * the universal-hash formula, matching the reference's int-universe
  * `trueIndices` domain.
  *
  * @param numTables L — number of bands / hash tables
  * @param rowsPerBand k — number of minhash functions concatenated per band
  * @param seed model parameter seed (reference pins 0)
  */
final class MinHashModel(val numTables: Int, val rowsPerBand: Int, val seed: Long = 0L)
    extends Serializable {
  import MinHashModel._

  /** Universal-hash parameters, exposed for the DuckDB oracle generator
    * ([[graft.DuckSql]]) which bakes them into SQL literals.
    */
  val A: Array[Int] = new Array[Int](numTables * rowsPerBand)
  val B: Array[Int] = new Array[Int](numTables * rowsPerBand)
  def paramsA: Array[Int] = A
  def paramsB: Array[Int] = B
  locally {
    val rng = new Random(seed)
    var i = 0
    while (i < A.length) { A(i) = rng.nextInt(HashPrime - 1); i += 1 }
    i = 0
    while (i < B.length) { B(i) = rng.nextInt(HashPrime - 1); i += 1 }
  }

  /** Per-table chain-init hashes (mix of seed + table index) — exposed for
    * the oracle generator.
    */
  def bandInit(t: Int): Long = Hashing.mix64(seed ^ 0x6a09e667f3bcc909L, t.toLong)

  /** Sentinel bands of the empty set — exposed for the oracle generator. */
  def emptyBandHashes: Array[Long] = emptyBands.clone()

  private val emptyBands: Array[Long] = {
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) { out(t) = Hashing.mix64(t.toLong, HashPrime.toLong); t += 1 }
    out
  }

  /** Raw minima matrix (L*k ints) — exposed for kernel-parity tests against
    * the reference formula.
    *
    * One streaming pass over the shingles with the minima matrix
    * cache-resident, and the 64→32 fold computed ONCE per element: the
    * textbook minima-outer formulation re-reads the shingle array L·k times
    * and re-folds every element L·k times — at L=48, k=3 that is 144 redundant
    * passes per document over the hot path of the signatures phase. The
    * arithmetic per (element, function) cell is unchanged
    * (`((1 + ti) * a + b) % HASH_PRIME` in 32-bit Java overflow semantics,
    * exactly JaccardLshModel.java:55), so minima are bit-for-bit identical.
    */
  def minima(shingles: Array[Long]): Array[Int] = {
    val nm = numTables * rowsPerBand
    val out = new Array[Int](nm)
    java.util.Arrays.fill(out, Int.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val ti1 = 1 + Hashing.fold32(shingles(j)) // (1 + ti) with int overflow
      var i = 0
      while (i < nm) {
        val h = (ti1 * A(i) + B(i)) % HashPrime
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    out
  }

  /** L band hashes (one Long per table): mix of table index + its k minima.
    * Empty input → the sentinel bands (≙ `JaccardLshModel.java:43-45`).
    */
  def bandHashes(shingles: Array[Long]): Array[Long] = {
    if (shingles.isEmpty) return emptyBands
    val mins = minima(shingles)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var h = Hashing.mix64(seed ^ 0x6a09e667f3bcc909L, t.toLong)
      var r = 0
      while (r < rowsPerBand) {
        h = Hashing.mix64(h, mins(t * rowsPerBand + r).toLong)
        r += 1
      }
      out(t) = h
      t += 1
    }
    out
  }
}

object MinHashModel {
  /** ≙ `HashingModel.HASH_PRIME`, `/root/reference/.../models/HashingModel.java:5`. */
  val HashPrime: Int = 2038074743
}
