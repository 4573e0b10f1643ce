package graft.tools

import graft.{Dedup, DedupConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: bisect the candidates→verify chain of the checkpointed
  * pipeline's pairs stage on the events-derived corpus. Not part of the
  * engine. Usage: sbt "runMain graft.tools.VerProbe [sfDir]"
  */
object VerProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scratch = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm/graft-verprobe" else "/tmp/graft-verprobe"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Dedup.pipeline(spark, graft.sources.TranscriptGen.df(spark, 5000L), DedupConfig()).count()

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def conv(prefix: String) =
      concat(lit(prefix), lpad(col("user_id").cast("string"), 10, "0")).as("conv_id")
    val base = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("n_ev", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
    val orig = base.select(conv("u"), col("turn_idx"), lit("user").as("role"),
      col("event_type").as("text"), lit("").as("tool"), col("ts"))
    val dup = base.filter(col("turn_idx") < col("n_ev"))
      .select(conv("d"), col("turn_idx"), lit("user").as("role"),
        col("event_type").as("text"), lit("").as("tool"), col("ts"))
    val ts = orig.unionByName(dup)
    val cfg = DedupConfig()

    val sigs = Dedup.signatures(spark, Dedup.documents(ts), cfg).localCheckpoint(true)
    val groups = Dedup.repGroups(sigs).localCheckpoint(true)
    val repBands = groups.select(col("rep").as("conv_id"), col("bands")).localCheckpoint(true)
    println(s"VERPROBE sigs=${sigs.count()} reps=${repBands.count()}")

    println("VERPROBE bucket sizes (top):")
    graft.operators.CandidatePairs.bucketMetrics(repBands).limit(12).collect()
      .foreach(r => println(s"VERPROBE   bucket_size=${r.get(0)} n_buckets=${r.get(1)}"))
    val m0 = graft.operators.CandidatePairs.CandidateMetrics.register(spark)
    val cand = Dedup.candidates(repBands, cfg, Some(m0)).localCheckpoint(true)
    println(s"VERPROBE candidate_rows=${cand.count()} hotBuckets=${m0.hotBuckets.value} hotPostings=${m0.hotPostings.value} saltedPairs=${m0.saltedPairs.value}")

    (1 to 3).foreach { round =>
      val tScan = time {
        // candidates WITHOUT the trailing aggregation: the scan subtree only
        val m = graft.operators.CandidatePairs.CandidateMetrics.register(spark)
        Dedup.candidates(repBands, cfg, Some(m)).localCheckpoint(true): Unit
      }
      val tVerify = time {
        val m = graft.operators.CandidatePairs.CandidateMetrics.register(spark)
        Dedup.verify(Dedup.candidates(repBands, cfg, Some(m)), sigs, cfg).localCheckpoint(true): Unit
      }
      val tVerifyNoM = time {
        Dedup.verify(Dedup.candidates(repBands, cfg, None), sigs, cfg).localCheckpoint(true): Unit
      }
      println(f"VERPROBE round=$round cand_ckpt=$tScan%.2f cand+verify=$tVerify%.2f cand+verify_noMetrics=$tVerifyNoM%.2f")
    }
    spark.stop()
  }
}
