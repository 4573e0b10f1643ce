package graft.kernels

/** Text normalization + k-shingling → sorted distinct Array[Long] of
  * shingle hashes.
  *
  * This is the document→set encoding the reference models as
  * `Vec.SparseBool(trueIndices, totalIndices)`
  * (`/root/reference/elastiknn-api4s/src/main/scala/com/klibisz/elastiknn/api/Vec.scala:10-31`):
  * a sorted set over a fixed universe. Our universe is the 2^64 hash space;
  * sortedness is established once here, at "write time", exactly like the
  * reference sorts sparse indices on write
  * (`/root/reference/elastiknn-plugin/.../mapper/VectorMapper.scala:31`) so
  * every downstream intersection is a linear merge.
  */
object Shingler {

  sealed trait Mode
  /** k consecutive characters of the normalized text. */
  case object Chars extends Mode
  /** k consecutive whitespace-tokens of the normalized text. */
  case object Words extends Mode

  /** Lowercase, collapse all whitespace runs to single spaces, trim.
    * Deterministic, locale-independent (Char-level toLower).
    */
  def normalize(text: String): String = {
    if (text == null) return ""
    val sb = new java.lang.StringBuilder(text.length)
    var pendingSpace = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  /** Sorted distinct shingle-hash set of `text` (normalized first).
    * Empty/too-short text → empty array (the empty-set case the reference
    * maps to a sentinel hash, `JaccardLshModel.java:43-45`).
    *
    * Implementation: primitive `Array[Long]` end-to-end (a `HashSet[Long]`
    * boxes every element — one heap allocation per shingle on the hottest
    * loop of the signatures phase); distinctness comes from sort + in-place
    * dedup, which the contract needs anyway (sorted output).
    */
  def shingles(text: String, k: Int, mode: Mode, seed: Long = 0L): Array[Long] = {
    val norm = normalize(text)
    val raw: Array[Long] = mode match {
      case Chars =>
        if (norm.length < k) EmptyLongs
        else {
          val n = norm.length - k + 1
          val out = new Array[Long](n)
          var i = 0
          while (i < n) { out(i) = Hashing.hashChars(norm, i, k, seed); i += 1 }
          out
        }
      case Words =>
        if (norm.isEmpty) EmptyLongs
        else {
          // Token boundaries are single spaces after normalize; hash a
          // rolling window of k tokens by combining per-token hashes.
          var tok = new Array[Long](16)
          var nTok = 0
          var start = 0
          var i = 0
          while (i <= norm.length) {
            if (i == norm.length || norm.charAt(i) == ' ') {
              if (i > start) {
                if (nTok == tok.length) tok = java.util.Arrays.copyOf(tok, nTok * 2)
                tok(nTok) = Hashing.hashChars(norm, start, i - start, seed)
                nTok += 1
              }
              start = i + 1
            }
            i += 1
          }
          if (nTok < k) EmptyLongs
          else {
            val n = nTok - k + 1
            val out = new Array[Long](n)
            var j = 0
            while (j < n) {
              var h = seed ^ 0x2545f4914f6cdd1dL
              var m = 0
              while (m < k) { h = Hashing.mix64(h, tok(j + m)); m += 1 }
              out(j) = h
              j += 1
            }
            out
          }
        }
    }
    if (raw.length == 0) return raw
    java.util.Arrays.sort(raw)
    var w = 1
    var r = 1
    while (r < raw.length) {
      if (raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
  }

  private val EmptyLongs = new Array[Long](0)
}
