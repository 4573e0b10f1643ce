package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev microbench: higher-order-function similarity columns
  * (zip_with/aggregate — interpreted per element) vs a primitive-array UDF
  * computing the IDENTICAL sequential double arithmetic. Also asserts
  * bit-identity of the two forms over the real corpus (including the NaN
  * zero-norm case the HOF produces, which the UDF must reproduce exactly).
  */
object SimBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Raw HOF arithmetic: dot/sqrt(na*nb) with sequential double sums and NO
    * zero-norm guard (0/0 → NaN exactly like the column form).
    */
  private val cosineRaw = udf { (a: Array[Float], b: Array[Float]) =>
    var dp = 0.0; var n1 = 0.0; var n2 = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dp += x * y; n1 += x * x; n2 += y * y
      i += 1
    }
    dp / math.sqrt(n1 * n2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-simbench/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scoredBase = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .crossJoin(broadcast(q)).filter(col("q_id") =!= col("n_id"))
      .localCheckpoint(true)
    println(s"[simbench] pairs=${scoredBase.count()}")

    // warmup both paths
    noop(scoredBase.withColumn("sim", graft.operators.Knn.cosineCol("q_emb", "n_emb")))
    noop(scoredBase.withColumn("sim", cosineRaw(col("q_emb"), col("n_emb"))))

    for (rep <- 1 to 3) {
      val tHof = time(noop(scoredBase.withColumn("sim", graft.operators.Knn.cosineCol("q_emb", "n_emb"))))
      val tUdf = time(noop(scoredBase.withColumn("sim", cosineRaw(col("q_emb"), col("n_emb")))))
      println(f"[simbench] rep=$rep hof=$tHof%.3f udf=$tUdf%.3f")
    }

    // bit-identity over the full pair set (NaN == NaN via <=> null-safe eq
    // after double comparison: use exact binary compare through cast to
    // string of the double bits)
    val both = scoredBase
      .withColumn("h", graft.operators.Knn.cosineCol("q_emb", "n_emb"))
      .withColumn("u", cosineRaw(col("q_emb"), col("n_emb")))
    val diff = both.filter(!(col("h") <=> col("u")) &&
      !(isnan(col("h")) && isnan(col("u")))).count()
    println(s"[simbench] mismatches=$diff")
    spark.stop()
  }
}
