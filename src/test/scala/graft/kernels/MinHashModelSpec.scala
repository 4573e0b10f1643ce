package graft.kernels

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.util.Random

/** Kernel-parity + law tests for MinHash, mirroring the reference's test
  * strategy (seeded-random differential reps vs a naive formulation +
  * golden laws; ≙ `ExactSimilarityFunctionSuite.scala:12-148` style).
  */
class MinHashModelSpec extends AnyFunSuite with Matchers {

  /** Naive re-statement of JaccardLshModel.java:27-63 used as differential
    * reference: identical parameter stream + identical 32-bit formula.
    */
  private def referenceMinima(L: Int, k: Int, seed: Long, indices32: Array[Int]): Array[Int] = {
    val rng = new Random(seed)
    val A = Array.fill(L * k)(rng.nextInt(MinHashModel.HashPrime - 1))
    val B = Array.fill(L * k)(rng.nextInt(MinHashModel.HashPrime - 1))
    Array.tabulate(L * k) { i =>
      indices32.map(ti => ((1 + ti) * A(i) + B(i)) % MinHashModel.HashPrime).min
    }
  }

  private def randomSet(rng: Random, maxLen: Int = 200): Array[Long] = {
    val n = 1 + rng.nextInt(maxLen)
    Array.fill(n)(rng.nextLong()).distinct.sorted
  }

  test("minima match the reference formula (JaccardLshModel.java:42-63) bit-for-bit, 300 reps") {
    val rng = new Random(7)
    (0 until 300).foreach { _ =>
      val s = randomSet(rng)
      val l = 1 + rng.nextInt(8)
      val k = 1 + rng.nextInt(3)
      val m = new MinHashModel(l, k, seed = 0L)
      m.minima(s) shouldBe referenceMinima(l, k, 0L, s.map(Hashing.fold32))
    }
  }

  test("band hash count is exactly L, deterministic, order-invariant") {
    val m = new MinHashModel(32, 2)
    val rng = new Random(11)
    (0 until 100).foreach { _ =>
      val s = randomSet(rng)
      val h1 = m.bandHashes(s)
      h1.length shouldBe 32
      h1 shouldBe m.bandHashes(s.clone())
      h1 shouldBe m.bandHashes(s.reverse)
    }
  }

  test("empty set hashes to the sentinel bands (JaccardLshModel.java:43-45 semantics)") {
    val m = new MinHashModel(8, 2)
    val e1 = m.bandHashes(Array.empty[Long])
    e1 shouldBe m.bandHashes(Array.empty[Long])
    e1.length shouldBe 8
    e1 should not be m.bandHashes(Array(1L, 2L, 3L))
  }

  test("identical sets collide in all bands; disjoint sets collide in ~0") {
    val m = new MinHashModel(64, 1)
    val a = Array.tabulate(200)(i => Hashing.mix64(i.toLong)).sorted
    val b = Array.tabulate(200)(i => Hashing.mix64(i + 10000L)).sorted
    m.bandHashes(a) shouldBe m.bandHashes(a.clone())
    val collisions = m.bandHashes(a).zip(m.bandHashes(b)).count { case (x, y) => x == y }
    collisions should be <= 2
  }

  test("collision rate tracks Jaccard similarity (banding S-curve sanity, r=1)") {
    // With k=1 rows per band, P(band collision) = jaccard similarity.
    val m = new MinHashModel(512, 1)
    val base = Array.tabulate(300)(i => Hashing.mix64(i.toLong)).sorted
    for (overlap <- Seq(0.5, 0.8, 0.95)) {
      val keep = (300 * overlap).toInt
      val other = (base.take(keep) ++ Array.tabulate(300 - keep)(i => Hashing.mix64(i + 99999L))).sorted
      val jac = ExactSim.jaccard(base, other)
      val rate = m.bandHashes(base).zip(m.bandHashes(other)).count { case (x, y) => x == y } / 512.0
      rate shouldBe jac +- 0.08
    }
  }

  test("containment monotonicity: more overlap → no fewer band collisions (statistical)") {
    val m = new MinHashModel(256, 1)
    val base = Array.tabulate(400)(i => Hashing.mix64(i.toLong)).sorted
    val rates = Seq(0.3, 0.6, 0.9).map { overlap =>
      val keep = (400 * overlap).toInt
      val other = (base.take(keep) ++ Array.tabulate(400 - keep)(i => Hashing.mix64(i + 77777L))).sorted
      m.bandHashes(base).zip(m.bandHashes(other)).count { case (x, y) => x == y }
    }
    rates shouldBe rates.sorted
  }

  test("different seeds give different signatures") {
    val s = Array.tabulate(50)(i => Hashing.mix64(i.toLong)).sorted
    new MinHashModel(16, 2, seed = 0L).bandHashes(s) should not be
      new MinHashModel(16, 2, seed = 1L).bandHashes(s)
  }
}
