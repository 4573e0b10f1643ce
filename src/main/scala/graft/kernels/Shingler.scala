package graft.kernels

import scala.collection.mutable

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
    */
  def shingles(text: String, k: Int, mode: Mode, seed: Long = 0L): Array[Long] = {
    val norm = normalize(text)
    val set = new mutable.HashSet[Long]
    mode match {
      case Chars =>
        if (norm.length >= k) {
          var i = 0
          val end = norm.length - k
          while (i <= end) {
            set.add(Hashing.hashChars(norm, i, k, seed))
            i += 1
          }
        }
      case Words =>
        if (norm.nonEmpty) {
          // Token boundaries are single spaces after normalize; hash a
          // rolling window of k tokens by combining per-token hashes.
          val tokenHashes = mutable.ArrayBuffer.empty[Long]
          var start = 0
          var i = 0
          while (i <= norm.length) {
            if (i == norm.length || norm.charAt(i) == ' ') {
              if (i > start) tokenHashes += Hashing.hashChars(norm, start, i - start, seed)
              start = i + 1
            }
            i += 1
          }
          if (tokenHashes.length >= k) {
            var j = 0
            val end = tokenHashes.length - k
            while (j <= end) {
              var h = seed ^ 0x2545f4914f6cdd1dL
              var m = 0
              while (m < k) { h = Hashing.mix64(h, tokenHashes(j + m)); m += 1 }
              set.add(h)
              j += 1
            }
          }
        }
    }
    val arr = set.toArray
    java.util.Arrays.sort(arr)
    arr
  }
}
