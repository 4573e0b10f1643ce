package graft.kernels

/** Longest-common-substring kernel for the borderline-pair verification pass
  * (SURVEY §7.2 "suffix-array LCS"). Implemented with a suffix automaton of
  * the first string (O(n) build, O(m) scan — public construction, see e.g.
  * Blumer et al. 1985 / cp-algorithms suffix automaton), which beats the
  * O(nm) DP and the O((n+m) log) suffix-array route for per-pair use.
  *
  * Run only on bounded candidate pairs (never all-pairs) — the operator's
  * inputs are the verify stage's borderline band-matches.
  */
object Lcs {

  /** Length of the longest common substring of a and b. */
  def lcsLength(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    // --- build suffix automaton of a ---
    val maxStates = 2 * a.length + 4
    val len = new Array[Int](maxStates)
    val link = new Array[Int](maxStates)
    val trans = new Array[java.util.HashMap[Character, Integer]](maxStates)
    var last = 0
    var size = 1
    len(0) = 0; link(0) = -1; trans(0) = new java.util.HashMap[Character, Integer]()
    var i = 0
    while (i < a.length) {
      val c = a.charAt(i)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      link(cur) = -1
      trans(cur) = new java.util.HashMap[Character, Integer]()
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, cur)
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p).get(c).intValue()
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          trans(clone) = new java.util.HashMap[Character, Integer](trans(q))
          while (p != -1 && trans(p).get(c) != null && trans(p).get(c).intValue() == q) {
            trans(p).put(c, clone)
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }
    // --- scan b through the automaton ---
    var v = 0
    var l = 0
    var best = 0
    var j = 0
    while (j < b.length) {
      val c = b.charAt(j)
      while (v != 0 && !trans(v).containsKey(c)) {
        v = link(v)
        l = len(v)
      }
      if (trans(v).containsKey(c)) {
        v = trans(v).get(c).intValue()
        l += 1
      }
      if (l > best) best = l
      j += 1
    }
    best
  }

  /** LCS length normalized by the shorter string's length ∈ [0,1];
    * both empty → 1 (consistent with the empty-doc duplicate contract,
    * ≙ `ExactModel.java:13`).
    */
  def lcsRatio(a: String, b: String): Double = {
    val mn = math.min(a.length, b.length)
    if (mn == 0) { if (a.length == b.length) 1.0 else 0.0 }
    else lcsLength(a, b).toDouble / mn
  }
}
