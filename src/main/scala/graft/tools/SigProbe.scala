package graft.tools

import graft.{Dedup, DedupConfig}
import graft.kernels.{Hashing, MinHashModel, Shingler, SimHashModel}
import graft.sources.TranscriptGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: decompose the signatures phase (the dominant pipeline stage —
  * 78% of the 8-core width in BENCH rehearsals) into scan / assembly /
  * shingle / simhash / minhash / checkpoint-store deltas, so optimization
  * effort lands where the time actually goes. Not part of the engine.
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.SigProbe 300000"
  */
object SigProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 300000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val scratch = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm/graft-sigprobe" else "/tmp/graft-sigprobe"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cfg = DedupConfig()

    // warmup
    Dedup.pipeline(spark, TranscriptGen.df(spark, 5000L), cfg).count()

    val dir = s"$scratch/transcripts-$nConvs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_SUCCESS")))
      TranscriptGen.df(spark, nConvs).repartition(64).write.mode("overwrite").parquet(dir)
    val input = spark.read.parquet(dir)

    val tScan = time { input.count(): Unit }
    val tAsmAgg = time { noop(Dedup.documents(input)) }
    var docs: DataFrame = null
    val tAsmCkpt = time { docs = Dedup.documents(input).localCheckpoint(true) }

    // kernel-only stages over the checkpointed docs (no assembly in the way)
    val tShingle = time {
      noop(docs.selectExpr("conv_id", "coalesce(doc_text, '') as doc_text").as[(String, String)]
        .mapPartitions { iter =>
          iter.map { case (id, text) =>
            (id, Shingler.shingles(text, cfg.shingleK, cfg.shingleMode, cfg.seed).length)
          }
        }.toDF("conv_id", "n"))
    }
    val tSimhash = time {
      noop(graft.operators.Signatures.simhashSignatures(spark, docs, cfg))
    }
    val tFull = time { noop(Dedup.signatures(spark, docs, cfg)) }
    val tFullCkpt = time { Dedup.signatures(spark, docs, cfg).localCheckpoint(true); () }

    // minhash-only variant (shingle + minima + bands, no simhash/set_hash)
    val tMinhashOnly = time {
      noop(docs.selectExpr("conv_id", "coalesce(doc_text, '') as doc_text").as[(String, String)]
        .mapPartitions { iter =>
          val model = new MinHashModel(cfg.numTables, cfg.rowsPerBand, cfg.seed)
          iter.map { case (id, text) =>
            val sh = Shingler.shingles(text, cfg.shingleK, cfg.shingleMode, cfg.seed)
            (id, model.bandHashes(sh))
          }
        }.toDF("conv_id", "bands"))
    }

    println(f"""SIGPROBE {"cpus":$cpus,"convs":$nConvs,"scan":$tScan%.2f,"asm_noop":$tAsmAgg%.2f,"asm_ckpt":$tAsmCkpt%.2f,"shingle":$tShingle%.2f,"simhash_sig":$tSimhash%.2f,"minhash_sig":$tMinhashOnly%.2f,"full_sig":$tFull%.2f,"full_sig_ckpt":$tFullCkpt%.2f}""")
    spark.stop()
  }
}
