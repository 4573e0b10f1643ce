package graft

import graft.sources.TranscriptGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugStages {
  def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

  def run(cpus: Int, nConvs: Long): Unit = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    Dedup.pipeline(spark, TranscriptGen.df(spark, 60L), cfg).count()
    val tGen = t { TranscriptGen.df(spark, nConvs).count(): Unit }
    val tAsm = t { Dedup.documents(TranscriptGen.df(spark, nConvs)).count(): Unit }
    var sigs: org.apache.spark.sql.DataFrame = null
    val tSig = t { sigs = Dedup.signatures(spark, Dedup.documents(TranscriptGen.df(spark, nConvs)), cfg).localCheckpoint(true) }
    var mapping: org.apache.spark.sql.DataFrame = null
    val tMap = t { mapping = Dedup.exactGroups(sigs).localCheckpoint(true) }
    var repSigs: org.apache.spark.sql.DataFrame = null
    val tRep = t { repSigs = sigs.join(mapping.select(col("rep").as("conv_id")).distinct(), Seq("conv_id"), "left_semi").localCheckpoint(true) }
    var pairs: org.apache.spark.sql.DataFrame = null
    val tCand = t { pairs = Dedup.candidates(repSigs, cfg).localCheckpoint(true) }
    var ver: org.apache.spark.sql.DataFrame = null
    val tVer = t { ver = Dedup.verify(pairs, repSigs, cfg).localCheckpoint(true) }
    val tCC = t { graft.operators.ConnectedComponents.assign(repSigs.select(col("conv_id")), ver).count(): Unit }
    println(f"STAGES cpus=$cpus n=$nConvs gen=$tGen%.2f asm=$tAsm%.2f sig=$tSig%.2f map=$tMap%.2f rep=$tRep%.2f cand=$tCand%.2f (pairs=${pairs.count()}) ver=$tVer%.2f (verified=${ver.count()}) cc=$tCC%.2f")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    run(2, n)
    run(2, n)
    run(8, n)
    run(8, n)
  }
}
