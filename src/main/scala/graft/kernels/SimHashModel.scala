package graft.kernels

/** 64-bit SimHash fingerprint over a shingle-hash set (Charikar 2002).
  *
  * Mathematically the same family as the reference's random-hyperplane
  * Cosine LSH (`/root/reference/elastiknn-models/.../models/CosineLshModel.java:39-51`)
  * specialized to sparse 0/1 vectors: each hyperplane sign-bit for a set of
  * shingles is the sign of a sum of ±1 contributions, one per shingle. Using
  * the shingle's own hash bits as the ±1 projections (the classic SimHash
  * construction) avoids materializing gaussian planes over a 2^64 universe.
  *
  * Candidates produced from SimHash are verified with exact Hamming
  * similarity, mirroring the reference's Hamming pairing
  * (`HammingLshModel.java` index-sampling ↔ `ExactModel.hammingSimilarity`).
  */
object SimHashModel {

  /** 64-bit fingerprint; empty set → 0L (the sentinel fingerprint — empty
    * docs are identical, Hamming distance 0, matching the reference's
    * empty↦sentinel + `Jaccard(∅,∅)=1` semantics, `ExactModel.java:13`).
    */
  def fingerprint(shingles: Array[Long], seed: Long = 0L): Long = {
    if (shingles.isEmpty) return 0L
    // ones(b) = count of elements whose projection bit b is 1; the ±1 vote
    // passes iff ones > zeros ⇔ 2·ones > n — same fingerprint as the
    // increment/decrement formulation, with a branchless inner loop
    val ones = new Array[Int](64)
    var i = 0
    while (i < shingles.length) {
      // Re-mix with the seed so fingerprints for different seeds are
      // independent; each bit of the mixed hash is a ±1 plane projection.
      val h = Hashing.mix64(shingles(i) ^ seed)
      var b = 0
      while (b < 64) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val n = shingles.length
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > n) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Hamming distance between two fingerprints (0..64). */
  @inline def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Band a 64-bit fingerprint into `numBands` equal-width bands for LSH
    * bucketing (≙ banding the bit-sampled hashes of `HammingLshModel`).
    * Returns one Long bucket key per band (band index mixed in).
    */
  def bands(fp: Long, numBands: Int): Array[Long] = {
    require(64 % numBands == 0, s"numBands must divide 64, got $numBands")
    val width = 64 / numBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val out = new Array[Long](numBands)
    var i = 0
    while (i < numBands) {
      out(i) = Hashing.mix64(i.toLong, (fp >>> (i * width)) & mask)
      i += 1
    }
    out
  }
}
