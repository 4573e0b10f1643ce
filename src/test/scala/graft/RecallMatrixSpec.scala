package graft

import graft.tools.RecallMatrix
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pinned recall regression matrix ≙ the reference's RecallSuite
  * (`RecallSuite.scala:41-145`): every LSH family at two configs, recall
  * pinned within ±0.02 of the measured value on the deterministic sf0.001
  * fixtures. A silent regression in any model's hashing math fails here
  * even when looser ≥-threshold tests would still pass.
  *
  * Re-pin (after a *deliberate* model change only) with
  * `runMain graft.tools.RecallScout`.
  */
class RecallMatrixSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val pinned = Map(
    "cosine L=64 k=4" -> 1.000,
    "cosine L=32 k=8" -> 0.410,
    "cosine L=16 k=8" -> 0.236,
    "l2 L=24 k=2 w=4" -> 1.000,
    "l2 L=12 k=2 w=4" -> 1.000,
    "l2 L=8 k=4 w=8" -> 0.992,
    "l2-multiprobe L=12 k=2 w=4 p=6" -> 1.000,
    "l2-multiprobe L=8 k=4 w=8 p=12" -> 1.000,
    "permutation k=16 rep=true" -> 1.000,
    "permutation k=8 rep=false" -> 0.818,
    "bitsampling L=32 k=8" -> 0.960,
    "bitsampling L=16 k=16" -> 0.444,
    "minhash L=64 k=2" -> 1.000,
    "minhash L=48 k=3" -> 1.000,
    "simhash bands=8" -> 1.000
  )

  test("recall matrix matches pinned values within ±0.02") {
    val measured = RecallMatrix.compute(spark)
    measured.size shouldBe pinned.size
    measured.foreach { case (name, r) =>
      withClue(s"$name: ") {
        pinned.contains(name) shouldBe true
        r shouldBe pinned(name) +- 0.02
      }
    }
  }
}
