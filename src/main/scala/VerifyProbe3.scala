import graft.{Dedup, DedupConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable

object VerifyProbe3 {
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
    val input = s.read.parquet(s"/dev/shm/graft-bench/transcripts-$nConvs")
    val sigs = Dedup.signatures(s, Dedup.documents(input), cfg).localCheckpoint(true)
    val mapping = Dedup.exactGroups(sigs).localCheckpoint(true)
    val repSigs = sigs.join(mapping.select(col("rep").as("conv_id")).distinct(), Seq("conv_id"), "left_semi").localCheckpoint(true)
    val pairs = Dedup.candidates(repSigs, cfg).localCheckpoint(true)
    println("nPairs=" + pairs.count())

    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long, Int)]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.take(60),
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)),
          m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
          m.executorRunTime, si.numTasks))
      }
    })
    val t0 = System.nanoTime()
    Dedup.verify(pairs, repSigs, cfg).count()
    println(f"verify=${(System.nanoTime()-t0)/1e9}%.2f")
    Thread.sleep(500)
    stages.sortBy(-_._3).take(12).foreach { case (id, name, wall, sw, sr, run, nt) =>
      println(f"stage=$id wall=${wall/1000.0}%.1fs tasks=$nt cpuRun=${run/1000.0}%.1fs shufW=${sw/1e6}%.0fMB shufR=${sr/1e6}%.0fMB $name")
    }
    s.stop()
  }
}
