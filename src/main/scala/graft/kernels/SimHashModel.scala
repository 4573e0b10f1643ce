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
    // increment/decrement formulation. The per-bit counting is SWAR-packed
    // (this loop runs once per shingle inside the dominant signature-phase
    // kernel): eight 64-bit accumulators each hold eight 8-bit lanes, so a
    // shingle's 64 votes cost 8 shift/mask/add triples instead of 64
    // array updates; lanes flush into the int counters every ≤255 shingles
    // (an 8-bit lane cannot overflow within a block). Counts — and hence
    // fingerprints — are bit-identical to the scalar loop (kernel parity
    // pinned in KernelsSpec/RecallMatrixSpec and the DuckDB oracles, which
    // recompute the same votes independently).
    val ones = new Array[Int](64)
    val lane = 0x0101010101010101L
    val n = shingles.length
    var i = 0
    while (i < n) {
      val end = math.min(i + 255, n)
      var a0 = 0L; var a1 = 0L; var a2 = 0L; var a3 = 0L
      var a4 = 0L; var a5 = 0L; var a6 = 0L; var a7 = 0L
      while (i < end) {
        // Re-mix with the seed so fingerprints for different seeds are
        // independent; each bit of the mixed hash is a ±1 plane projection.
        val h = Hashing.mix64(shingles(i) ^ seed)
        a0 += h & lane
        a1 += (h >>> 1) & lane
        a2 += (h >>> 2) & lane
        a3 += (h >>> 3) & lane
        a4 += (h >>> 4) & lane
        a5 += (h >>> 5) & lane
        a6 += (h >>> 6) & lane
        a7 += (h >>> 7) & lane
        i += 1
      }
      // lane j of accumulator k counts bit (k + 8·j)
      var k = 0
      while (k < 8) {
        val acc = k match {
          case 0 => a0; case 1 => a1; case 2 => a2; case 3 => a3
          case 4 => a4; case 5 => a5; case 6 => a6; case _ => a7
        }
        var j = 0
        while (j < 8) {
          ones(k + 8 * j) += ((acc >>> (8 * j)) & 0xffL).toInt
          j += 1
        }
        k += 1
      }
    }
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
