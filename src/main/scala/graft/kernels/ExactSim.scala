package graft.kernels

/** Exact similarity kernels — the verification operators.
  *
  * Definitions match the reference exactly:
  * `/root/reference/elastiknn-models/src/main/java/com/klibisz/elastiknn/models/ExactModel.java:10-38`
  * (jaccard/hamming/l1/l2/cosine) and
  * `/root/reference/elastiknn-models/src/main/java/com/klibisz/elastiknn/vectors/BooleanVectorOps.java:15-34`
  * (two-pointer sorted intersection count) /
  * `DefaultFloatVectorOps.java:7-39` (float-vector distances).
  * Loops are deliberately while-based over primitive arrays (no boxing), the
  * same consideration the reference documents at `BooleanVectorOps.java:10-12`.
  */
object ExactSim {

  /** Two-pointer intersection count over *sorted* long arrays
    * (≙ `BooleanVectorOps.sortedIntersectionCount`, adapted to the 64-bit
    * shingle-hash universe).
    */
  def sortedIntersectionCount(v1: Array[Long], v2: Array[Long]): Int = {
    var n = 0; var xi = 0; var yi = 0
    while (xi < v1.length && yi < v2.length) {
      val x = v1(xi); val y = v2(yi)
      if (x < y) xi += 1
      else if (x > y) yi += 1
      else { n += 1; xi += 1; yi += 1 }
    }
    n
  }

  /** ≙ `ExactModel.jaccardSimilarity` (`ExactModel.java:10-16`):
    * `isec / (|a|+|b|-isec)`; **empty∩empty = 1** — empty documents are
    * mutual duplicates by contract.
    */
  def jaccard(v1: Array[Long], v2: Array[Long]): Double = {
    val isec = sortedIntersectionCount(v1, v2)
    val denom = v1.length + v2.length - isec
    if (isec == 0 && denom == 0) 1.0
    else if (denom > 0) isec.toDouble / denom
    else 0.0
  }

  /** ≙ `ExactModel.hammingSimilarity` (`ExactModel.java:19-23`) over
    * sorted true-index sets in a universe of `totalIndices` dimensions.
    */
  def hamming(v1: Array[Long], v2: Array[Long], totalIndices: Long): Double = {
    val eq = sortedIntersectionCount(v1, v2)
    val neq = math.max(v1.length - eq, 0) + math.max(v2.length - eq, 0)
    (totalIndices - neq).toDouble / totalIndices
  }

  /** Hamming similarity of two 64-bit SimHash fingerprints (universe = 64). */
  def hammingSim64(a: Long, b: Long): Double =
    (64 - java.lang.Long.bitCount(a ^ b)) / 64.0

  // ---- dense float kernels (≙ DefaultFloatVectorOps.java) ----

  /** ≙ `DefaultFloatVectorOps.dotProduct` (double accumulator). */
  def dot(v1: Array[Float], v2: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v1.length) { s += v1(i).toDouble * v2(i); i += 1 }
    s
  }

  def l1Distance(v1: Array[Float], v2: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v1.length) { s += math.abs(v1(i).toDouble - v2(i)); i += 1 }
    s
  }

  def l2Distance(v1: Array[Float], v2: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v1.length) { val d = v1(i).toDouble - v2(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** ≙ `ExactModel.l2Similarity`: `1/(1+dist)`. */
  def l2Sim(v1: Array[Float], v2: Array[Float]): Double = 1.0 / (1.0 + l2Distance(v1, v2))

  /** ≙ `ExactModel.l1Similarity`: `1/(1+dist)`. */
  def l1Sim(v1: Array[Float], v2: Array[Float]): Double = 1.0 / (1.0 + l1Distance(v1, v2))

  /** Plain cosine in [-1,1] (≙ `DefaultFloatVectorOps.cosineSimilarity`,
    * `DefaultFloatVectorOps.java:7-21`): zero-norm pairs → 1 if equal
    * element-wise, else -1.
    */
  def cosine(v1: Array[Float], v2: Array[Float]): Double = {
    var dp = 0.0; var n1 = 0.0; var n2 = 0.0; var i = 0
    while (i < v1.length) {
      val a = v1(i).toDouble; val b = v2(i).toDouble
      dp += a * b; n1 += a * a; n2 += b * b
      i += 1
    }
    if (n1 > 0 && n2 > 0) dp / math.sqrt(n1 * n2)
    else if (java.util.Arrays.equals(v1, v2)) 1.0
    else -1.0
  }

  /** ≙ `ExactModel.cosineSimilarity`: `1 + cosine` ∈ [0, 2] (the reference's
    * ES-safe non-negative score, `ExactModel.java:36-38`).
    */
  def cosineScore(v1: Array[Float], v2: Array[Float]): Double = 1.0 + cosine(v1, v2)
}
