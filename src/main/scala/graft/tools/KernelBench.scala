package graft.tools

import graft.kernels.{MinHashModel, Shingler, SimHashModel}

/** Dev micro-benchmark for the per-document signature kernels (no Spark):
  * times shingling, MinHash band hashes, and SimHash fingerprints over a
  * deterministic synthetic corpus, so kernel micro-optimizations can be
  * iterated without paying a cluster run. Not part of the engine.
  *
  * Usage: sbt "runMain graft.tools.KernelBench [nDocs] [tokensPerDoc]"
  */
object KernelBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 20000
    val toks = if (args.length > 1) args(1).toInt else 700
    val rng = new java.util.Random(7)
    val texts = Array.tabulate(nDocs) { _ =>
      val sb = new StringBuilder(toks * 6)
      var i = 0
      while (i < toks) { sb.append('w').append(rng.nextInt(5000)).append(' '); i += 1 }
      sb.toString
    }
    val model = new MinHashModel(48, 3, 0L)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val sink = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"KERNELBENCH $label%-12s $dt%7.3f s  (sink=$sink)")
    }

    // warmup all paths
    (0 until 3).foreach { _ =>
      var s = 0L
      texts.take(2000).foreach { t =>
        val sh = Shingler.shingles(t, 3, Shingler.Words, 0L)
        s += model.bandHashes(sh).sum + SimHashModel.fingerprint(sh, 0L)
      }
    }

    val shingled = texts.map(t => Shingler.shingles(t, 3, Shingler.Words, 0L))

    time("shingle") {
      var s = 0L
      texts.foreach(t => s += Shingler.shingles(t, 3, Shingler.Words, 0L).length)
      s
    }
    time("minhash") {
      var s = 0L
      shingled.foreach(sh => s += model.bandHashes(sh)(0))
      s
    }
    time("simhash") {
      var s = 0L
      shingled.foreach(sh => s += SimHashModel.fingerprint(sh, 0L))
      s
    }

    // ---- experimental minima variants (same math, different loop shapes) ----
    val A = model.paramsA
    val B = model.paramsB
    val nm = A.length

    def minimaV1(shingles: Array[Long]): Array[Int] = { // current shape, local literal P
      val out = new Array[Int](nm)
      java.util.Arrays.fill(out, Int.MaxValue)
      var j = 0
      while (j < shingles.length) {
        val h64 = shingles(j)
        val ti1 = 1 + (h64 ^ (h64 >>> 32)).toInt
        var i = 0
        while (i < nm) {
          val h = (ti1 * A(i) + B(i)) % 2038074743
          if (h < out(i)) out(i) = h
          i += 1
        }
        j += 1
      }
      out
    }

    def minimaV2(shingles: Array[Long]): Array[Int] = { // 2-way shingle unroll
      val out = new Array[Int](nm)
      java.util.Arrays.fill(out, Int.MaxValue)
      val n = shingles.length
      var j = 0
      while (j + 1 < n) {
        val h0 = shingles(j); val h1 = shingles(j + 1)
        val t0 = 1 + (h0 ^ (h0 >>> 32)).toInt
        val t1 = 1 + (h1 ^ (h1 >>> 32)).toInt
        var i = 0
        while (i < nm) {
          val a = A(i); val b = B(i)
          val x0 = (t0 * a + b) % 2038074743
          val x1 = (t1 * a + b) % 2038074743
          val m = if (x0 < x1) x0 else x1
          if (m < out(i)) out(i) = m
          i += 1
        }
        j += 2
      }
      if (j < n) {
        val h0 = shingles(j)
        val t0 = 1 + (h0 ^ (h0 >>> 32)).toInt
        var i = 0
        while (i < nm) {
          val x0 = (t0 * A(i) + B(i)) % 2038074743
          if (x0 < out(i)) out(i) = x0
          i += 1
        }
      }
      out
    }

    def minimaV4(shingles: Array[Long]): Array[Int] = { // 4-way shingle unroll
      val out = new Array[Int](nm)
      java.util.Arrays.fill(out, Int.MaxValue)
      val n = shingles.length
      var j = 0
      while (j + 3 < n) {
        val h0 = shingles(j); val h1 = shingles(j + 1); val h2 = shingles(j + 2); val h3 = shingles(j + 3)
        val t0 = 1 + (h0 ^ (h0 >>> 32)).toInt
        val t1 = 1 + (h1 ^ (h1 >>> 32)).toInt
        val t2 = 1 + (h2 ^ (h2 >>> 32)).toInt
        val t3 = 1 + (h3 ^ (h3 >>> 32)).toInt
        var i = 0
        while (i < nm) {
          val a = A(i); val b = B(i)
          val x0 = (t0 * a + b) % 2038074743
          val x1 = (t1 * a + b) % 2038074743
          val x2 = (t2 * a + b) % 2038074743
          val x3 = (t3 * a + b) % 2038074743
          val m01 = if (x0 < x1) x0 else x1
          val m23 = if (x2 < x3) x2 else x3
          val m = if (m01 < m23) m01 else m23
          if (m < out(i)) out(i) = m
          i += 1
        }
        j += 4
      }
      while (j < n) {
        val h0 = shingles(j)
        val t0 = 1 + (h0 ^ (h0 >>> 32)).toInt
        var i = 0
        while (i < nm) {
          val x0 = (t0 * A(i) + B(i)) % 2038074743
          if (x0 < out(i)) out(i) = x0
          i += 1
        }
        j += 1
      }
      out
    }

    (0 until 2).foreach { _ => // warmup variants
      shingled.take(2000).foreach { sh => minimaV1(sh); minimaV2(sh); minimaV4(sh) }
    }
    time("minimaV1") { var s = 0L; shingled.foreach(sh => s += minimaV1(sh)(0)); s }
    time("minimaV2") { var s = 0L; shingled.foreach(sh => s += minimaV2(sh)(0)); s }
    time("minimaV4") { var s = 0L; shingled.foreach(sh => s += minimaV4(sh)(0)); s }
    // sanity: identical minima
    val ref = model.minima(shingled(0))
    require(java.util.Arrays.equals(ref, minimaV1(shingled(0))), "V1 mismatch")
    require(java.util.Arrays.equals(ref, minimaV2(shingled(0))), "V2 mismatch")
    require(java.util.Arrays.equals(ref, minimaV4(shingled(0))), "V4 mismatch")
    println("KERNELBENCH variants verified identical")
  }
}
