package graft.kernels

/** Deterministic 64-bit hashing primitives shared by the shingler and the
  * LSH kernels. All derived from public-domain constructions (splitmix64
  * finalizer, FNV-style folding); no external libraries.
  *
  * The reference (alexklibisz/elastiknn) stores LSH hashes as Lucene term
  * byte arrays (`elastiknn-models/.../storage/ByteBufferSerialization.java`);
  * on a Spark shuffle a 64-bit Long is strictly better (fixed width, no
  * boxing, Tungsten-friendly), so every hash in this engine is a Long.
  */
object Hashing {

  /** splitmix64 finalizer — a strong 64-bit bit mixer (public domain,
    * Steele et al., used verbatim in JDK SplittableRandom).
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine two longs into one mixed hash (order-sensitive). */
  @inline def mix64(a: Long, b: Long): Long = mix64(a * 0x9e3779b97f4a7c15L + b)

  /** Hash a string's UTF-16 code units into a well-mixed 64-bit value.
    * Deterministic across JVMs/partitions (no identity hashing, no seed
    * from time).
    */
  def hashString(s: String, seed: Long = 0L): Long = {
    var h = mix64(seed ^ 0x51_7c_c1_b7_27_22_0a_95L)
    var i = 0
    while (i < s.length) {
      h = mix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    mix64(h ^ s.length.toLong)
  }

  /** Hash `len` chars of `s` starting at `from` — allocation-free substring
    * hash used by the character shingler.
    */
  def hashChars(s: String, from: Int, len: Int, seed: Long): Long = {
    var h = mix64(seed ^ 0x51_7c_c1_b7_27_22_0a_95L)
    var i = from
    val end = from + len
    while (i < end) {
      h = mix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    mix64(h ^ len.toLong)
  }

  /** Fold a 64-bit hash to a 32-bit int (xor-fold keeps both halves'
    * entropy). Used to feed the reference's 32-bit MinHash formula.
    */
  @inline def fold32(h: Long): Int = (h ^ (h >>> 32)).toInt
}
