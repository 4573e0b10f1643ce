package graft.kernels

import java.util.Random

/** Cosine LSH (random hyperplanes) — faithful re-implementation of
  * `/root/reference/elastiknn-models/src/main/java/com/klibisz/elastiknn/models/CosineLshModel.java:26-52`:
  * `L*k` gaussian hyperplanes drawn in row order from `Random(seed)`; per
  * table, k sign bits of the plane·v dot products packed LSB-first
  * (≙ `BitBuffer.IntBuffer`), prefixed by the table index. Magnitude
  * invariant by construction (tested like `CosineLshModelSuite.scala:13-29`).
  */
final class CosineLshModel(val dims: Int, val numTables: Int, val rowsPerBand: Int, val seed: Long = 0L)
    extends Serializable {

  private val planes: Array[Array[Float]] = {
    val rng = new Random(seed)
    Array.fill(numTables * rowsPerBand) {
      val p = new Array[Float](dims)
      var j = 0
      while (j < dims) { p(j) = rng.nextGaussian().toFloat; j += 1 }
      p
    }
  }

  /** L table hashes: mix(tableIdx, packed sign bits). */
  def hash(values: Array[Float]): Array[Long] = {
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bits = 0L
      var k = 0
      while (k < rowsPerBand) {
        // dot > 0 → 1 bit, ≙ CosineLshModel.java:44-46
        if (ExactSim.dot(planes(t * rowsPerBand + k), values) > 0) bits |= (1L << k)
        k += 1
      }
      out(t) = Hashing.mix64(t.toLong, bits)
      t += 1
    }
    out
  }
}

/** L2 LSH (p-stable projections), no-probing variant — faithful to
  * `/root/reference/elastiknn-models/.../models/L2LshModel.java:39-86`:
  * `A[L*k]` gaussian vectors then `B[L*k] = rng.nextFloat()*w`, hash
  * `floor((a·v + b) / w)` per row, k hashes concatenated per table with the
  * table prefix. Multiprobe (`hashWithProbing`, `:88-140`) is a query-time
  * recall knob for serving; in batch dedup we raise L instead (SURVEY §2.3
  * H4), so probing is intentionally not implemented.
  */
final class L2LshModel(val dims: Int, val numTables: Int, val rowsPerBand: Int, val w: Int, val seed: Long = 0L)
    extends Serializable {

  // B is drawn after all of A from the same stream (L2LshModel.java:51-65)
  private val (aParams: Array[Array[Float]], bParams: Array[Float]) = {
    val rng = new Random(seed)
    val a = Array.fill(numTables * rowsPerBand) {
      val p = new Array[Float](dims)
      var j = 0
      while (j < dims) { p(j) = rng.nextGaussian().toFloat; j += 1 }
      p
    }
    val b = new Array[Float](numTables * rowsPerBand)
    var i = 0
    while (i < b.length) { b(i) = rng.nextFloat() * w; i += 1 }
    (a, b)
  }

  def hash(values: Array[Float]): Array[Long] = {
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var h = Hashing.mix64(seed ^ 0xbb67ae8584caa73bL, t.toLong)
      var k = 0
      while (k < rowsPerBand) {
        val i = t * rowsPerBand + k
        val bucket = math.floor((ExactSim.dot(aParams(i), values) + bParams(i)) / w).toInt
        h = Hashing.mix64(h, bucket.toLong)
        k += 1
      }
      out(t) = h
      t += 1
    }
    out
  }
}

/** Permutation LSH — faithful to
  * `/root/reference/elastiknn-models/.../models/PermutationLshModel.java:19-52`
  * and its golden examples (`PermutationLshModelSuite.scala:13-47`): the k
  * largest-|value| indices, 1-based and sign-tagged (negated when the value
  * is negative), with freq = k − rank (rank shared by ties, subsequent ranks
  * skipped) when `repeating`, else 1.
  */
final class PermutationLshModel(val k: Int, val repeating: Boolean) extends Serializable {

  /** Array of (signedIndex, freq) pairs, highest |value| first. */
  def hash(values: Array[Float]): Array[(Int, Int)] = {
    val idx = Array.range(0, values.length)
    // stable sort by descending |value|. The reference's PriorityQueue does
    // NOT guarantee pop order for equal keys; our stable sort (ties in
    // index order) is strictly more deterministic — identical output for
    // all inputs without cross-boundary |value| ties, deterministic either
    // way. Freqs are unaffected (ties share a rank in both).
    val sorted = idx.sortBy(i => -math.abs(values(i)))
    val n = math.min(k, values.length)
    val out = new Array[(Int, Int)](n)
    var rankComplement = -1
    var currTies = 0
    var prevAbs = Float.PositiveInfinity
    var ix = 0
    while (ix < n) {
      val i = sorted(ix)
      val currAbs = math.abs(values(i))
      if (currAbs < prevAbs) {
        rankComplement += 1 + currTies
        prevAbs = currAbs
        currTies = 0
      } else currTies += 1
      val signedIndex = if (values(i) >= 0) i + 1 else -1 - i
      val freq = if (repeating) k - rankComplement else 1
      out(ix) = (signedIndex, freq)
      ix += 1
    }
    out
  }
}
