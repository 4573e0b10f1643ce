package graft.kernels

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.util.Random

class SimHashModelSpec extends AnyFunSuite with Matchers {

  test("deterministic; identical sets → distance 0") {
    val s = Array.tabulate(100)(i => Hashing.mix64(i.toLong)).sorted
    val f1 = SimHashModel.fingerprint(s)
    f1 shouldBe SimHashModel.fingerprint(s.clone())
    SimHashModel.hammingDistance(f1, f1) shouldBe 0
  }

  test("empty set → sentinel 0L") {
    SimHashModel.fingerprint(Array.empty[Long]) shouldBe 0L
  }

  test("hamming distance decreases as overlap increases (LSH property)") {
    val base = Array.tabulate(400)(i => Hashing.mix64(i.toLong)).sorted
    val fb = SimHashModel.fingerprint(base)
    val dists = Seq(0.3, 0.7, 0.95).map { overlap =>
      val keep = (400 * overlap).toInt
      val other = (base.take(keep) ++ Array.tabulate(400 - keep)(i => Hashing.mix64(i + 55555L))).sorted
      SimHashModel.hammingDistance(fb, SimHashModel.fingerprint(other))
    }
    dists.reverse shouldBe dists.reverse.sorted // higher overlap → smaller distance
    dists.last should be < 8
    dists.head should be > 15
  }

  test("unrelated sets → distance ≈ 32 (random fingerprints)") {
    val a = Array.tabulate(300)(i => Hashing.mix64(i.toLong)).sorted
    val b = Array.tabulate(300)(i => Hashing.mix64(i + 123456L)).sorted
    val d = SimHashModel.hammingDistance(SimHashModel.fingerprint(a), SimHashModel.fingerprint(b))
    d should (be >= 16 and be <= 48)
  }

  test("SWAR vote counting is bit-identical to the scalar reference loop") {
    // the scalar form the SWAR packing replaced — any lane-overflow or
    // flush-boundary bug in the packed counters shows up here, including
    // at block sizes straddling the 255-shingle flush
    def scalarFingerprint(shingles: Array[Long], seed: Long): Long = {
      if (shingles.isEmpty) return 0L
      val ones = new Array[Int](64)
      var i = 0
      while (i < shingles.length) {
        val h = Hashing.mix64(shingles(i) ^ seed)
        var b = 0
        while (b < 64) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (2 * ones(b) > shingles.length) fp |= (1L << b); b += 1 }
      fp
    }
    val rng = new Random(99)
    for (n <- Seq(1, 2, 7, 254, 255, 256, 511, 513, 2048); seed <- Seq(0L, 42L)) {
      val s = Array.fill(n)(rng.nextLong())
      SimHashModel.fingerprint(s, seed) shouldBe scalarFingerprint(s, seed)
    }
  }

  test("bands: count, determinism, full-collision for identical fingerprints") {
    val fp = 0x0123456789abcdefL
    val b = SimHashModel.bands(fp, 8)
    b.length shouldBe 8
    b shouldBe SimHashModel.bands(fp, 8)
    an[IllegalArgumentException] should be thrownBy SimHashModel.bands(fp, 7)
  }
}

class BitSamplingModelSpec extends AnyFunSuite with Matchers {

  test("emits exactly L table hashes, deterministic (≙ HammingLshModelSuite.scala:14-27 law)") {
    val m = new BitSamplingModel(dims = 128, numTables = 10, rowsPerBand = 3)
    val v = Array(1, 5, 17, 63, 99)
    val h = m.hash(v)
    h.length shouldBe 10
    h shouldBe m.hash(v.clone())
  }

  test("both sampling regimes (L*k <= dims and L*k > dims, HammingLshModel.java:36-48)") {
    val small = new BitSamplingModel(dims = 100, numTables = 5, rowsPerBand = 4) // 20 <= 100
    val big = new BitSamplingModel(dims = 10, numTables = 5, rowsPerBand = 4)    // 20 > 10
    small.hash(Array(1, 2, 3)).length shouldBe 5
    big.hash(Array(1, 2, 3)).length shouldBe 5
  }

  test("identical vectors collide in all tables; similar vectors collide in most") {
    val m = new BitSamplingModel(dims = 1024, numTables = 32, rowsPerBand = 2)
    val rng = new Random(5)
    val a = Array.fill(200)(rng.nextInt(1024)).distinct.sorted
    m.hash(a) shouldBe m.hash(a.clone())
    // flip a few positions
    val b = (a.drop(3) ++ Array(1030 % 1024)).distinct.sorted
    val coll = m.hash(a).zip(m.hash(b)).count { case (x, y) => x == y }
    coll should be > 16
  }

  test("sampleNoReplacement: correct size, no duplicates, within range") {
    val s = BitSamplingModel.sampleNoReplacement(new Random(0), 50, 100)
    s.length shouldBe 50
    s.distinct.length shouldBe 50
    all(s) should (be >= 0 and be < 100)
  }
}

class CosineLshModelSpec extends AnyFunSuite with Matchers {

  test("magnitude invariance (≙ CosineLshModelSuite.scala:13-29)") {
    val rng = new Random(0)
    val m = new CosineLshModel(dims = 64, numTables = 16, rowsPerBand = 4)
    (0 until 20).foreach { _ =>
      val v = Array.fill(64)(rng.nextFloat() * 2 - 1)
      val scaled = v.map(_ * 7.5f)
      m.hash(v) shouldBe m.hash(scaled)
    }
  }

  test("L hashes, deterministic; similar vectors collide more than random ones") {
    val rng = new Random(1)
    val m = new CosineLshModel(dims = 64, numTables = 64, rowsPerBand = 1)
    val a = Array.fill(64)(rng.nextFloat() * 2 - 1)
    val near = a.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val far = Array.fill(64)(rng.nextFloat() * 2 - 1)
    m.hash(a).length shouldBe 64
    val collNear = m.hash(a).zip(m.hash(near)).count { case (x, y) => x == y }
    val collFar = m.hash(a).zip(m.hash(far)).count { case (x, y) => x == y }
    collNear should be > collFar
  }
}

class L2LshModelSpec extends AnyFunSuite with Matchers {

  test("exactly L hashes (≙ L2LshSuite.scala:15-20 law), deterministic") {
    val m = new L2LshModel(dims = 32, numTables = 20, rowsPerBand = 2, w = 4)
    val rng = new Random(3)
    val v = Array.fill(32)(rng.nextFloat() * 10)
    m.hash(v).length shouldBe 20
    m.hash(v) shouldBe m.hash(v.clone())
  }

  test("nearby vectors share more buckets than distant ones") {
    val m = new L2LshModel(dims = 32, numTables = 64, rowsPerBand = 1, w = 10)
    val rng = new Random(4)
    val a = Array.fill(32)(rng.nextFloat() * 10)
    val near = a.map(_ + 0.01f)
    val far = a.map(_ + 25f)
    val collNear = m.hash(a).zip(m.hash(near)).count { case (x, y) => x == y }
    val collFar = m.hash(a).zip(m.hash(far)).count { case (x, y) => x == y }
    collNear should be > collFar
  }

  test("multiprobe: exactly L*(1+min(p, 3^k-1)) hashes (≙ L2LshSuite.scala:22-37 law)") {
    val rng = new Random(5)
    val v = Array.fill(16)(rng.nextFloat() * 10)
    for {
      l <- 1 to 6
      k <- 1 to 4
      m = new L2LshModel(dims = 16, numTables = l, rowsPerBand = k, w = 1)
      maxForK = math.pow(3, k).toInt - 1
      p <- 0 to maxForK + 3
    } withClue(s"L=$l k=$k p=$p") {
      m.hashWithProbes(v, p).length shouldBe l * (1 + math.min(p, maxForK))
    }
  }

  test("multiprobe: first L hashes equal the no-probe hashes (≙ L2LshSuite.scala:39-46)") {
    val rng = new Random(6)
    val v = Array.fill(24)(rng.nextFloat() * 10)
    val m = new L2LshModel(dims = 24, numTables = 10, rowsPerBand = 3, w = 1)
    m.hashWithProbes(v, 3).take(10).toSeq shouldBe m.hash(v).toSeq
  }

  test("multiprobe: probe hashes are the neighbors' unprobed hashes (recall mechanism)") {
    // a probe hash is useful iff it can equal the *unprobed* hash of a
    // nearby vector in an adjacent bucket — verify probes of v cover the
    // unprobed buckets of a shifted vector that no-probe hashing misses
    val rng = new Random(7)
    val v = Array.fill(8)(rng.nextFloat() * 5)
    val u = v.map(_ + 0.4f)
    val m = new L2LshModel(dims = 8, numTables = 12, rowsPerBand = 2, w = 2)
    val noProbeHits = m.hash(v).toSet.intersect(m.hash(u).toSet).size
    val probeHits = m.hashWithProbes(v, 8).toSet.intersect(m.hash(u).toSet).size
    probeHits should be >= noProbeHits
    probeHits should be > 0
  }
}

class PermutationLshModelSpec extends AnyFunSuite with Matchers {

  test("example from paper (≙ PermutationLshModelSuite.scala:13-18)") {
    val m = new PermutationLshModel(4, repeating = true)
    m.hash(Array(0.1f, -0.3f, -0.4f, 0f, 0.2f)).toSeq shouldBe Seq((-3, 4), (-2, 3), (5, 2), (1, 1))
  }

  test("example from paper without repetition (≙ :20-26)") {
    val m = new PermutationLshModel(4, repeating = false)
    m.hash(Array(0.1f, -0.3f, -0.4f, 0f, 0.2f)).toSeq shouldBe Seq((-3, 1), (-2, 1), (5, 1), (1, 1))
  }

  test("another example (≙ :28-38)") {
    val m = new PermutationLshModel(4, repeating = true)
    m.hash(Array(10f, -2f, 0f, 99f, 0.1f, -8f, 42f, -13f, 6f, 0.1f)).toSeq shouldBe
      Seq((4, 4), (7, 3), (-8, 2), (1, 1))
  }

  test("ties (≙ :40-46): two-way tie for 2nd place → no 3rd") {
    val m = new PermutationLshModel(4, repeating = true)
    m.hash(Array(2f, 2f, 0f, 0f, 1f, 4f)).toSeq.sorted shouldBe
      Seq((6, 4), (1, 3), (2, 3), (5, 1)).sorted
  }

  test("deterministic (≙ :49-58)") {
    val rng = new Random(0)
    val m = new PermutationLshModel(16, repeating = true)
    (0 until 20).foreach { _ =>
      val v = Array.fill(128)(rng.nextFloat() * 2 - 1)
      m.hash(v).toSeq shouldBe m.hash(v.clone()).toSeq
    }
  }
}

class LcsSpec extends AnyFunSuite with Matchers {

  /** Naive O(n·m) DP reference. */
  private def naiveLcs(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length) {
      if (a.charAt(i - 1) == b.charAt(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    }
    best
  }

  test("matches naive DP on 500 random string pairs") {
    val rng = new Random(6)
    (0 until 500).foreach { _ =>
      val a = Array.fill(rng.nextInt(60))(('a' + rng.nextInt(4)).toChar).mkString
      val b = Array.fill(rng.nextInt(60))(('a' + rng.nextInt(4)).toChar).mkString
      Lcs.lcsLength(a, b) shouldBe naiveLcs(a, b)
    }
  }

  test("edges: empty strings, identity, containment") {
    Lcs.lcsLength("", "") shouldBe 0
    Lcs.lcsLength("abc", "") shouldBe 0
    Lcs.lcsLength("abcdef", "abcdef") shouldBe 6
    Lcs.lcsLength("xxabcxx", "yyabcyy") shouldBe 3
    Lcs.lcsRatio("", "") shouldBe 1.0
    Lcs.lcsRatio("abc", "abc") shouldBe 1.0
    Lcs.lcsRatio("", "abc") shouldBe 0.0
  }
}
