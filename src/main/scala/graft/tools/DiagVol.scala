package graft.tools

import graft.{Dedup, DedupConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DiagVol {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-diag/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("n_ev", count(lit(1)).over(Window.partitionBy(col("user_id"))))
    def conv(prefix: String) = concat(lit(prefix), lpad(col("user_id").cast("string"), 10, "0")).as("conv_id")
    val orig = base.select(conv("u"), col("turn_idx"), lit("user").as("role"), col("event_type").as("text"), lit("").as("tool"), col("ts"))
    val dup = base.filter(col("turn_idx") < col("n_ev")).select(conv("d"), col("turn_idx"), lit("user").as("role"), col("event_type").as("text"), lit("").as("tool"), col("ts"))
    val ts = orig.unionByName(dup).localCheckpoint(true)
    val cfg = DedupConfig()
    val sigs = Dedup.signatures(spark, Dedup.documents(ts), cfg).localCheckpoint(true)
    println(s"[diag] docs=${sigs.count()}")
    val groups = Dedup.repGroups(sigs).localCheckpoint(true)
    println(s"[diag] reps=${groups.count()}")
    val rb = groups.select(col("rep").as("conv_id"), col("bands"))
    println(s"[diag] postings=${rb.select(explode(col("bands"))).count()}")
    // raw pair volume before hit-count filter: re-do the scan pieces
    val cand = Dedup.candidates(rb, cfg).localCheckpoint(true)
    println(s"[diag] candidates(minBands>=8)=${cand.count()}")
    println(s"[diag] candTotalBands=${cand.agg(sum(col("matching_bands"))).first().getLong(0)}")
    // distribution of bucket sizes
    val bm = graft.operators.CandidatePairs.bucketMetrics(rb)
    bm.orderBy(desc("bucket_size")).show(20, false)
    val pairRows = bm.agg(sum(col("bucket_size")*(col("bucket_size")-1)/2 * col("n_buckets"))).first()
    println(s"[diag] enumeratedPairRows(approx, ignoring cap)=$pairRows")
    spark.stop()
  }
}
// appended diag #2: distinct pair count vs emissions
object DiagVol2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-diag/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("n_ev", count(lit(1)).over(Window.partitionBy(col("user_id"))))
    def conv(prefix: String) = concat(lit(prefix), lpad(col("user_id").cast("string"), 10, "0")).as("conv_id")
    val orig = base.select(conv("u"), col("turn_idx"), lit("user").as("role"), col("event_type").as("text"), lit("").as("tool"), col("ts"))
    val dup = base.filter(col("turn_idx") < col("n_ev")).select(conv("d"), col("turn_idx"), lit("user").as("role"), col("event_type").as("text"), lit("").as("tool"), col("ts"))
    val ts = orig.unionByName(dup).localCheckpoint(true)
    val cfg = DedupConfig()
    val sigs = Dedup.signatures(spark, Dedup.documents(ts), cfg).localCheckpoint(true)
    val rb = Dedup.repGroups(sigs).select(col("rep").as("conv_id"), col("bands"))
    // raw per-band pair emissions and their distinct count, via a plain
    // exploded self-join (diagnostic only)
    val posts = rb.select(col("conv_id"), explode(col("bands")).as("band")).localCheckpoint(true)
    val pairs = posts.as("a").join(posts.as("b"), Seq("band"))
      .filter(col("a.conv_id") < col("b.conv_id"))
      .select(col("a.conv_id").as("id_a"), col("b.conv_id").as("id_b"))
      .localCheckpoint(true)
    println(s"[diag2] emissions=${pairs.count()}")
    println(s"[diag2] distinctPairs=${pairs.distinct().count()}")
    // per-128-partition collapse ratio if pre-counted in-scan (approx: group by hash partition of band)
    spark.stop()
  }
}
