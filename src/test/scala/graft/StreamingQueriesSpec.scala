package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

class StreamingQueriesSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming exact dedup keeps first doc per content key across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val docs = mem.toDF().toDF("conv_id", "doc_text", "ts")
    val out = StreamingDedup.exactDedupStream(s, docs, DedupConfig())
    val q = out.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      mem.addData(("a", "hello world foo bar baz", t), ("b", "hello world foo bar baz", t),
        ("c", "completely different text here", t))
      q.processAllAvailable()
      mem.addData(("d", "  HELLO   world foo bar BAZ ", t)) // same set after normalization
      q.processAllAvailable()
      // flush pending state by advancing the watermark past the horizon
      mem.addData(("z", "flusher doc text zzz yyy xxx", Timestamp.valueOf("2024-01-01 03:00:00")))
      q.processAllAvailable()
      val ids = s.sql("select conv_id from dedup_out").collect().map(_.getString(0)).toSet
      ids should contain("c")
      // exactly one of the duplicate group {a,b,d} survives
      Set("a", "b", "d").intersect(ids).size shouldBe 1
    } finally q.stop()
  }

  test("dedup state is evicted past the watermark (bounded-state contract)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val docs = mem.toDF().toDF("conv_id", "doc_text", "ts")
    val out = StreamingDedup.exactDedupStream(s, docs, DedupConfig(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_evict").outputMode("append").start()
    try {
      mem.addData(("a", "same duplicate content here folks", Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // advance the watermark far past a's eviction horizon (00:00 + 1h)
      mem.addData(("w", "unrelated watermark advancing doc", Timestamp.valueOf("2024-01-01 05:00:00")))
      q.processAllAvailable()
      // same content again, well after eviction: with bounded state this is
      // re-emitted (the key aged out); unbounded state would suppress it
      mem.addData(("a2", "same duplicate content here folks", Timestamp.valueOf("2024-01-01 05:30:00")))
      q.processAllAvailable()
      mem.addData(("z", "final flusher document text", Timestamp.valueOf("2024-01-01 09:00:00")))
      q.processAllAvailable()
      val ids = s.sql("select conv_id from dedup_evict").collect().map(_.getString(0)).toSet
      ids should contain allOf ("a", "a2")
    } finally q.stop()
  }

  test("streaming signatures equal batch signatures on identical docs") {
    val s = spark
    import s.implicits._
    val cfg = DedupConfig()
    val docs = Seq(("x", "the quick brown fox jumps over the lazy dog again"),
      ("y", "some other words entirely for the second document here")).toDF("conv_id", "doc_text")
    val streamPath = StreamingDedup.signatures(s, docs, cfg)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3))).toSet
    val batchPath = Dedup.signatures(s, docs, cfg)
      .select("conv_id", "bands", "simhash", "set_hash")
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3))).toSet
    streamPath shouldBe batchPath
  }

  test("near-dup against a static index finds the duplicate via band join") {
    val s = spark
    import s.implicits._
    val cfg = DedupConfig()
    val index = Dedup.signatures(s,
      Seq(("old1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          ("old2", "unrelated content words that do not match anything else")).toDF("conv_id", "doc_text"), cfg)
    val incoming = StreamingDedup.signatures(s,
      Seq(("new1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          ("new2", "totally novel text with fresh words nobody wrote before")).toDF("conv_id", "doc_text"), cfg)
    val hits = StreamingDedup.nearDupAgainstIndex(incoming, index, cfg)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    hits shouldBe Set(("new1", "old1"))
  }

  test("foreachBatch near-dup verify: every emitted pair is exactly verified (precision 1.0)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val cfg = DedupConfig(minBands = 1)
    val index = Dedup.signatures(s,
      Seq(("old1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          ("old2", "unrelated content words that do not match anything else at all"))
        .toDF("conv_id", "doc_text"), cfg).localCheckpoint(true)

    val mem = MemoryStream[(String, String)]
    val docs = mem.toDF().toDF("conv_id", "doc_text")
    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    val q = docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // the production shape: full signature kernel on the micro-batch,
      // then candidates + exact verify against the static index
      val batchSigs = Dedup.signatures(s, batch, cfg)
      val verified = StreamingDedup.nearDupVerified(batchSigs, index, cfg)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
      collected.synchronized { collected ++= verified }
      ()
    }.start()
    try {
      mem.addData(
        // old1 + one appended word: 8 of 9 shingles shared, jaccard 8/9 >= θ
        ("new1", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
        // shares 5 of 8 shingles with old1 (jaccard 5/11 ≈ 0.45): bands
        // collide at minBands=1, but jaccard is well below θ=0.8 — must be
        // verified away (this is the precision contract under test)
        ("new2", "alpha beta gamma delta epsilon zeta eta different words entirely"),
        ("new3", "totally novel text with fresh words nobody wrote before"))
      q.processAllAvailable()
    } finally q.stop()
    // candidates (pre-verify) include the borderline pair; verified must not
    val cands = StreamingDedup.nearDupAgainstIndex(
      Dedup.signatures(s, Seq(
        ("new1", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
        ("new2", "alpha beta gamma delta epsilon zeta eta different words entirely"),
        ("new3", "totally novel text with fresh words nobody wrote before")).toDF("conv_id", "doc_text"), cfg),
      index, cfg).collect().map(r => (r.getString(0), r.getString(1))).toSet
    cands should contain(("new2", "old1")) // candidate exists pre-verify...
    val got = collected.map(t => (t._1, t._2)).toSet
    got shouldBe Set(("new1", "old1")) // ...and verify removes it
    all(collected.map(_._3)) should be >= cfg.theta
  }

  test("Queries ADT plans and executes; incompatible corpus rejected at plan time (Q2 semantics)") {
    val s = spark
    import s.implicits._
    val text = Seq(("t1", "one two three four five six"), ("t2", "one two three four five six"),
      ("t3", "different doc body entirely here now")).toDF("conv_id", "doc_text")
    val vecs = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    // exact dedup groups t1/t2
    val groups = Queries.run(s, text, Queries.ExactDedup())
    groups.filter(col("group_size") === 2).count() shouldBe 1

    // minhash dedup clusters t1/t2 together
    val clusters = Queries.run(s, text, Queries.MinHashDedup())
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    clusters("t1") shouldBe clusters("t2")
    clusters("t3") should not be clusters("t1")

    // knn on vectors works
    Queries.run(s, vecs, Queries.ExactKnn(3, _.filter(col("vec_id") < 3))).count() shouldBe 9

    // query-by-indexed-id (Q4 ≙ Vec.Indexed) equals the filter formulation
    val byId = Queries.run(s, vecs, Queries.KnnById(Seq(0L, 1L, 2L), 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val byFilter = Queries.run(s, vecs, Queries.ExactKnn(3, _.filter(col("vec_id") < 3)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    byId shouldBe byFilter

    // incompatible combinations rejected before execution
    an[IllegalArgumentException] should be thrownBy Queries.run(s, vecs, Queries.MinHashDedup())
    an[IllegalArgumentException] should be thrownBy Queries.run(s, text, Queries.ExactKnn(3))
  }
}
