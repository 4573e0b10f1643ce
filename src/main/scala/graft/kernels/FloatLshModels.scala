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

/** L2 LSH (p-stable projections) — faithful to
  * `/root/reference/elastiknn-models/.../models/L2LshModel.java:39-86`:
  * `A[L*k]` gaussian vectors then `B[L*k] = rng.nextFloat()*w`, hash
  * `floor((a·v + b) / w)` per row, k hashes concatenated per table with the
  * table prefix.
  *
  * [[hashWithProbes]] re-derives the multiprobe variant
  * (`L2LshModel.java:88-140`, Qin et al. 2007): query-side extra hashes
  * from ±1 bucket perturbations, drawn best-first from a single heap of
  * perturbation sets ordered by summed boundary distance, with the
  * shift/expand successor rule generating only valid sets. In batch dedup
  * raising L is usually the better knob (SURVEY §2.3 H4); probing is the
  * serving-style alternative that trades query-side hash count for recall
  * without reindexing.
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

  /** Max probe sets per table: 3 deltas per row minus the all-zeros set. */
  val maxProbesPerTable: Int = math.pow(3d, rowsPerBand).toInt - 1

  private def bandHash(t: Int, buckets: Array[Int]): Long = {
    var h = Hashing.mix64(seed ^ 0xbb67ae8584caa73bL, t.toLong)
    var k = 0
    while (k < rowsPerBand) { h = Hashing.mix64(h, buckets(k).toLong); k += 1 }
    h
  }

  /** One candidate row perturbation: row `ixk` of table `ixL` shifted by
    * `delta` ∈ {−1, +1}; `dist` = distance of the projection to the
    * crossed bucket boundary (the Qin et al. success-likelihood proxy).
    */
  private final case class Pert(ixL: Int, ixk: Int, delta: Int, dist: Double)

  /** A perturbation set: the chosen perturbations keyed by row, plus the
    * cursor `ixMax` into the per-table sorted candidate array and the
    * summed boundary distance (heap priority).
    */
  private final case class PSet(ixL: Int, members: Map[Int, Pert], ixMax: Int, sum: Double)

  /** The unperturbed L hashes followed by `L * min(probes, maxProbesPerTable)`
    * probe hashes drawn best-first (smallest summed boundary distance) from
    * a single heap across all tables — ≙ `hashWithProbing`,
    * `L2LshModel.java:88-140` with the same shift/expand successor rule.
    */
  def hashWithProbes(values: Array[Float], probes: Int): Array[Long] = {
    if (probes <= 0) return hash(values)
    val nProbes = math.min(probes, maxProbesPerTable)
    val out = new Array[Long](numTables * (1 + nProbes))

    // per-table: base buckets + the 2k candidate perturbations sorted by distance
    val baseBuckets = Array.ofDim[Int](numTables, rowsPerBand)
    val sorted = Array.ofDim[Pert](numTables, rowsPerBand * 2)
    var t = 0
    while (t < numTables) {
      var k = 0
      while (k < rowsPerBand) {
        val i = t * rowsPerBand + k
        val proj = ExactSim.dot(aParams(i), values) + bParams(i)
        val bucket = math.floor(proj / w).toInt
        baseBuckets(t)(k) = bucket
        val dneg = proj - bucket.toDouble * w
        sorted(t)(k * 2) = Pert(t, k, -1, math.abs(dneg))
        sorted(t)(k * 2 + 1) = Pert(t, k, 1, math.abs(w - dneg))
        k += 1
      }
      out(t) = bandHash(t, baseBuckets(t))
      java.util.Arrays.sort(sorted(t), Ordering.by((p: Pert) => p.dist))
      t += 1
    }

    // shift: replace the max-index member with the next candidate;
    // expand: add the next candidate. Both recursively re-shift when the
    // result would hold two perturbations of the same row.
    def shift(cand: Array[Pert], ps: PSet): PSet =
      if (ps.ixMax + 1 == cand.length) null
      else {
        val curr = cand(ps.ixMax)
        val next = cand(ps.ixMax + 1)
        val ns = PSet(ps.ixL, ps.members - curr.ixk + (next.ixk -> next), ps.ixMax + 1,
          ps.sum - curr.dist + next.dist)
        if (ps.members.contains(next.ixk) && curr.ixk != next.ixk) shift(cand, ns) else ns
      }
    def expand(cand: Array[Pert], ps: PSet): PSet =
      if (ps.ixMax + 1 == cand.length) null
      else {
        val next = cand(ps.ixMax + 1)
        val ns = PSet(ps.ixL, ps.members + (next.ixk -> next), ps.ixMax + 1, ps.sum + next.dist)
        if (ps.members.contains(next.ixk)) shift(cand, ns) else ns
      }

    val heap = new java.util.PriorityQueue[PSet](Ordering.by((p: PSet) => p.sum))
    t = 0
    while (t < numTables) {
      val head = sorted(t)(0)
      heap.add(PSet(t, Map(head.ixk -> head), 0, head.dist))
      t += 1
    }

    var ix = numTables
    val buckets = new Array[Int](rowsPerBand)
    while (ix < out.length) {
      val ai = heap.remove()
      val as = shift(sorted(ai.ixL), ai)
      val ae = expand(sorted(ai.ixL), ai)
      if (as != null) heap.add(as)
      if (ae != null) heap.add(ae)
      var k = 0
      while (k < rowsPerBand) {
        buckets(k) = baseBuckets(ai.ixL)(k) + ai.members.get(k).map(_.delta).getOrElse(0)
        k += 1
      }
      out(ix) = bandHash(ai.ixL, buckets)
      ix += 1
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
