package graft

import graft.plans.CheckpointedPipeline
import graft.sources.TranscriptGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Paths}
import scala.reflect.io.Directory

/** Resumability contract (north rule): checkpointed stages with lineage are
  * reused on rerun; changed config invalidates them; resumed results equal
  * fresh results.
  */
class CheckpointedPipelineSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val workDir = Files.createTempDirectory("graft-ckpt").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    new Directory(new java.io.File(workDir)).deleteRecursively()
  }

  private def clustersMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("conv_id", "cluster_id").collect().map(r => (r.getString(0), r.getString(1))).toMap

  test("fresh run writes all stages with lineage; rerun reuses every checkpoint; results identical") {
    val cfg = DedupConfig()
    val transcripts = TranscriptGen.df(spark, 400L)

    val (c1, s1) = CheckpointedPipeline.run(spark, transcripts, cfg, workDir)
    val m1 = clustersMap(c1)
    s1.map(_.name) shouldBe Seq("signatures", "pairs", "clusters")
    all(s1.map(_.reused)) shouldBe false
    Seq("signatures", "pairs", "clusters").foreach { st =>
      Files.exists(Paths.get(s"$workDir/$st/_lineage.json")) shouldBe true
    }
    // a cold corpus records the skew counters too, with zero salted work
    Files.readString(Paths.get(s"$workDir/pairs/_lineage.json")) should include(""""hot_buckets":""")
    // signatures laid out by stable id-hash bucket for per-bucket resume
    Files.list(Paths.get(s"$workDir/signatures")).iterator().hasNext shouldBe true

    val (c2, s2) = CheckpointedPipeline.run(spark, transcripts, cfg, workDir)
    all(s2.map(_.reused)) shouldBe true
    clustersMap(c2) shouldBe m1

    // partial resume: drop the final stage only → earlier stages reused
    new Directory(new java.io.File(s"$workDir/clusters")).deleteRecursively()
    val (c3, s3) = CheckpointedPipeline.run(spark, transcripts, cfg, workDir)
    s3.collect { case st if st.name != "clusters" => st.reused } shouldBe Seq(true, true)
    s3.find(_.name == "clusters").get.reused shouldBe false
    clustersMap(c3) shouldBe m1

    // config change invalidates all checkpoints
    val (c4, s4) = CheckpointedPipeline.run(spark, transcripts, cfg.copy(numTables = 32), workDir)
    all(s4.map(_.reused)) shouldBe false
    // same clusters at this corpus (lower L still finds the planted dups)
    clustersMap(c4) shouldBe m1
  }

  test("lineage records hot-bucket/salted-path metrics on a boilerplate-family corpus (no silent caps)") {
    val s = spark
    import s.implicits._
    // 120 near-identical docs (30 shared words + 1 unique): distinct shingle
    // sets (no exact collapse), but nearly every band bucket holds all 120
    // reps — far over bucketCap=8, so the salted path must do real work
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val transcripts = (0 until 120).map { i =>
      (f"c$i%04d", 0, "user", s"$base unique$i", "", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val work = Files.createTempDirectory("graft-ckpt-hot").toString
    try {
      val cfg = DedupConfig(bucketCap = 8)
      CheckpointedPipeline.run(spark, transcripts, cfg, work, nBuckets = 4)
      val lineage = Files.readString(Paths.get(s"$work/pairs/_lineage.json"))
      val hotBuckets = """"hot_buckets":(\d+)""".r.findFirstMatchIn(lineage).map(_.group(1).toLong)
      val saltedPairs = """"salted_pairs":(\d+)""".r.findFirstMatchIn(lineage).map(_.group(1).toLong)
      hotBuckets.getOrElse(fail(s"no hot_buckets in lineage: $lineage")) should be > 0L
      saltedPairs.getOrElse(fail(s"no salted_pairs in lineage: $lineage")) should be > 0L
    } finally new Directory(new java.io.File(work)).deleteRecursively()
  }
}
