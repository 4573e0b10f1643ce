package graft.kernels

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.util.Random

/** Differential tests: optimized kernels vs naive Set/seq formulations —
  * ≙ the reference's `ExactSimilarityFunctionSuite.scala:12-148`
  * (1000 random reps per similarity, tolerance 1e-7) against
  * `ExactSimilarityReference.scala:10-36`.
  */
class ExactSimSpec extends AnyFunSuite with Matchers {

  private val reps = 1000
  private val tol = 1e-7

  private def randomSet(rng: Random, maxLen: Int = 100): Array[Long] =
    Array.fill(rng.nextInt(maxLen))(rng.nextInt(500).toLong).distinct.sorted

  private def randomFloats(rng: Random, n: Int): Array[Float] =
    Array.fill(n)(rng.nextFloat() * 2 - 1)

  test("sortedIntersectionCount vs Set.intersect") {
    val rng = new Random(1)
    (0 until reps).foreach { _ =>
      val a = randomSet(rng); val b = randomSet(rng)
      ExactSim.sortedIntersectionCount(a, b) shouldBe a.toSet.intersect(b.toSet).size
    }
  }

  test("jaccard vs naive set formulation") {
    val rng = new Random(2)
    (0 until reps).foreach { _ =>
      val a = randomSet(rng); val b = randomSet(rng)
      val expected = {
        val i = a.toSet.intersect(b.toSet).size
        val u = a.toSet.union(b.toSet).size
        if (u == 0) 1.0 else i.toDouble / u
      }
      ExactSim.jaccard(a, b) shouldBe expected +- tol
    }
  }

  test("jaccard edges: empty/empty = 1 (ExactModel.java:13), identity = 1, disjoint = 0") {
    ExactSim.jaccard(Array.empty[Long], Array.empty[Long]) shouldBe 1.0
    val a = Array(1L, 5L, 9L)
    ExactSim.jaccard(a, a) shouldBe 1.0
    ExactSim.jaccard(a, Array(2L, 6L)) shouldBe 0.0
    ExactSim.jaccard(a, Array.empty[Long]) shouldBe 0.0
  }

  test("hamming vs naive formulation over a fixed universe") {
    val rng = new Random(3)
    val dims = 512
    (0 until reps).foreach { _ =>
      val a = randomSet(rng); val b = randomSet(rng)
      val av = Array.tabulate(dims)(i => a.contains(i.toLong))
      val bv = Array.tabulate(dims)(i => b.contains(i.toLong))
      val agree = av.zip(bv).count { case (x, y) => x == y }
      ExactSim.hamming(a, b, dims) shouldBe (agree.toDouble / dims) +- tol
    }
  }

  test("hammingSim64: identical = 1, complement = 0") {
    ExactSim.hammingSim64(0x0123456789abcdefL, 0x0123456789abcdefL) shouldBe 1.0
    ExactSim.hammingSim64(0L, -1L) shouldBe 0.0
  }

  test("dense kernels vs naive seq formulations") {
    val rng = new Random(4)
    (0 until reps).foreach { _ =>
      val n = 1 + rng.nextInt(64)
      val a = randomFloats(rng, n); val b = randomFloats(rng, n)
      val dotN = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val l1N = a.zip(b).map { case (x, y) => math.abs(x.toDouble - y) }.sum
      val l2N = math.sqrt(a.zip(b).map { case (x, y) => val d = x.toDouble - y; d * d }.sum)
      ExactSim.dot(a, b) shouldBe dotN +- tol
      ExactSim.l1Sim(a, b) shouldBe (1.0 / (1 + l1N)) +- tol
      ExactSim.l2Sim(a, b) shouldBe (1.0 / (1 + l2N)) +- tol
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na > 0 && nb > 0)
        ExactSim.cosine(a, b) shouldBe (dotN / (na * nb)) +- tol
    }
  }

  test("cosine zero-norm edges (DefaultFloatVectorOps.java:7-21): equal → 1, unequal → -1; score = 1+cos") {
    val z = Array(0f, 0f, 0f)
    ExactSim.cosine(z, z) shouldBe 1.0
    ExactSim.cosine(z, Array(0f, 1f, 0f)) shouldBe -1.0
    ExactSim.cosineScore(z, z) shouldBe 2.0
    ExactSim.cosineScore(z, Array(0f, 1f, 0f)) shouldBe 0.0
  }
}
