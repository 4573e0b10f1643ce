package graft.tools

import graft.{Dedup, DedupConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev utility: isolate the candidates/verify stages' scaling behavior.
  * Args: cores nConvs [shufflePartitionsFactor] [aqe]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nConvs = args(1).toLong
    val factor = if (args.length > 2) args(2).toInt else 1
    val aqe = if (args.length > 3) args(3).toBoolean else true
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * factor).toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    // warmup
    Dedup.pipeline(s, graft.sources.TranscriptGen.df(s, 5000L), cfg).count()
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val dir = s"/tmp/graft-bench-transcripts-$nConvs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_SUCCESS")))
      graft.sources.TranscriptGen.df(s, nConvs).write.mode("overwrite").parquet(dir)
    val input = s.read.parquet(dir)
    val sigs = Dedup.signatures(s, Dedup.documents(input), cfg).localCheckpoint(true)
    val mapping = Dedup.exactGroups(sigs).localCheckpoint(true)
    val repBands = Dedup.repBands(sigs).localCheckpoint(true)
    var hold: org.apache.spark.sql.DataFrame = null
    val tCand = time { hold = Dedup.candidates(repBands, cfg).localCheckpoint(true) }
    val cands = hold
    val nC = cands.count()
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      Dedup.verify(cands, sigs, cfg).explain("formatted")
    val tVer = time { hold = Dedup.verify(cands, sigs, cfg).localCheckpoint(true) }
    val nV = hold.count()
    println(f"SCALEPROBE cores=$cores factor=$factor aqe=$aqe cand=$tCand%.2f verify=$tVer%.2f nCand=$nC nVer=$nV")
    val tFused = time { hold = Dedup.verify(Dedup.candidates(repBands, cfg), sigs, cfg).localCheckpoint(true) }
    println(f"SCALEPROBE-FUSED cores=$cores candver=$tFused%.2f rows=${hold.count()}")
    s.stop()
  }
}
