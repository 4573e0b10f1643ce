import graft.{Dedup, DedupConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nConvs = args(1).toLong
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    Dedup.pipeline(s, graft.sources.TranscriptGen.df(s, 5000L), cfg).count()
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val input = s.read.parquet(s"/dev/shm/graft-bench/transcripts-$nConvs")
    val sigs = Dedup.signatures(s, Dedup.documents(input), cfg).localCheckpoint(true)
    val mapping = Dedup.exactGroups(sigs).localCheckpoint(true)
    val repSigs = sigs.join(mapping.select(col("rep").as("conv_id")).distinct(), Seq("conv_id"), "left_semi").localCheckpoint(true)
    val pairs = Dedup.candidates(repSigs, cfg).localCheckpoint(true)
    println("nPairs=" + pairs.count())
    val payload = repSigs.select(col("conv_id"), col("shingles"), col("simhash"))
    val j1 = pairs.hint("shuffle_hash").join(payload.withColumnRenamed("conv_id", "id_a")
      .withColumnRenamed("shingles", "sh_a").withColumnRenamed("simhash", "fp_a"), Seq("id_a"))
    val t1 = time { j1.count(): Unit }
    val j2 = j1.hint("shuffle_hash").join(payload.withColumnRenamed("conv_id", "id_b")
      .withColumnRenamed("shingles", "sh_b").withColumnRenamed("simhash", "fp_b"), Seq("id_b"))
    val t2 = time { j2.count(): Unit }
    val t3 = time { Dedup.verify(pairs, repSigs, cfg).count(): Unit }
    // variant: no hints (AQE free choice)
    val v2 = pairs.join(payload.withColumnRenamed("conv_id", "id_a")
        .withColumnRenamed("shingles", "sh_a").withColumnRenamed("simhash", "fp_a"), Seq("id_a"))
      .join(payload.withColumnRenamed("conv_id", "id_b")
        .withColumnRenamed("shingles", "sh_b").withColumnRenamed("simhash", "fp_b"), Seq("id_b"))
    val t4 = time { v2.count(): Unit }
    println(f"VERIFYPROBE cores=$cores j1=$t1%.2f j1j2=$t2%.2f full=$t3%.2f nohint=$t4%.2f")
    s.stop()
  }
}
