package graft.tools

import graft.DedupConfig
import graft.plans.CheckpointedPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_checkpointed_clusters / q_incremental_clusters
  * wall time into input materialization, fingerprint passes, per-stage
  * compute+write, resume reads, and cleanup. Not part of the engine.
  *
  * Usage: sbt "runMain graft.tools.CkptProbe [sfDir]"
  */
object CkptProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scratch = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm/graft-ckptprobe" else "/tmp/graft-ckptprobe"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall times with submission gaps — where do serial seconds go?
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val subTimes = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        subTimes.put(js.jobId, js.time)
        val gap = js.time - lastEnd.get()
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobLog.add(f"job=${js.jobId}%4d gap=${gap}%5d ms stages=${js.stageInfos.size} desc=$desc")
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val dur = je.time - subTimes.getOrDefault(je.jobId, je.time)
        lastEnd.set(je.time)
        jobLog.add(f"job=${je.jobId}%4d dur=${dur}%5d ms")
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        if (wall > 400) {
          val m = si.taskMetrics
          jobLog.add(f"  STAGE ${si.stageId}%4d wall=${wall}%5d ms tasks=${si.numTasks}%4d " +
            f"runTime=${m.executorRunTime}%5d cpu=${m.executorCpuTime / 1000000}%5d " +
            f"deser=${m.executorDeserializeTime}%5d ser=${m.resultSerializationTime}%4d " +
            f"name=${si.name.take(60)}")
        }
      }
    })
    graft.Dedup.pipeline(spark, graft.sources.TranscriptGen.df(spark, 5000L), DedupConfig()).count()

    // replicate the q_checkpointed_clusters body with instrumentation
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

    val tTsCount = time { ts.count(): Unit }
    val tFp = time { CheckpointedPipeline.inputFingerprint(ts): Unit }

    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(scratch.substring(0, scratch.lastIndexOf('/'))), "graft-ckpt-probe").toString

    var stages1: Seq[CheckpointedPipeline.StageInfo] = Nil
    jobLog.clear()
    val tRun1 = time {
      val (_, s1) = CheckpointedPipeline.run(spark, ts, DedupConfig(), work, nBuckets = 16)
      stages1 = s1
    }
    println("CKPTPROBE run1 job log:")
    jobLog.forEach(l => println(s"CKPTJOB $l"))
    var stages2: Seq[CheckpointedPipeline.StageInfo] = Nil
    var resumedCount = 0L
    val tRun2 = time {
      val (resumed, s2) = CheckpointedPipeline.run(spark, ts, DedupConfig(), work, nBuckets = 16)
      stages2 = s2
      resumedCount = resumed.localCheckpoint(true).count()
    }
    val tDel = time {
      val p = java.nio.file.Paths.get(work)
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    println(f"CKPTPROBE ts_count=$tTsCount%.2f fingerprint=$tFp%.2f run1=$tRun1%.2f run2=$tRun2%.2f del=$tDel%.2f")
    println(s"CKPTPROBE run1 stages: " + stages1.map(s => f"${s.name}=${s.wallSec}%.2f(rows=${s.rows})").mkString(" "))
    println(s"CKPTPROBE run2 stages: " + stages2.map(s => f"${s.name}=${s.wallSec}%.2f reused=${s.reused}").mkString(" "))

    // incremental shape
    val work2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(scratch.substring(0, scratch.lastIndexOf('/'))), "graft-ckpt-probe-i").toString
    val tRunU = time { CheckpointedPipeline.run(spark, ts.filter(col("conv_id").startsWith("u")), DedupConfig(), work2, nBuckets = 16): Unit }
    var stagesA: Seq[CheckpointedPipeline.StageInfo] = Nil
    val tApp = time {
      val (combined, sa) = CheckpointedPipeline.append(spark, ts.filter(col("conv_id").startsWith("d")), DedupConfig(), work2, nBuckets = 16)
      stagesA = sa
      combined.localCheckpoint(true).count(): Unit
    }
    val tDel2 = time {
      val p = java.nio.file.Paths.get(work2)
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    println(f"CKPTPROBE incr: run_u=$tRunU%.2f append=$tApp%.2f del=$tDel2%.2f")
    println(s"CKPTPROBE append stages: " + stagesA.map(s => f"${s.name}=${s.wallSec}%.2f(rows=${s.rows})").mkString(" "))
    spark.stop()
  }
}
