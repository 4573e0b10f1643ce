package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev measurement harness for the optimization rounds (guide §1): times
  * every declared query with the SAME session config and action as
  * `graft.Bench` phase 1 (count()), optionally several reps, and can dump
  * `.explain("formatted")` per query for the plan artifacts. Not part of
  * the frozen bench protocol — extra numbers cited in OPTIMIZATION_r*.md
  * come from here.
  *
  * Usage:
  *   sbt "runMain graft.tools.BenchExtra time [reps] [onlyQuery...]"
  *   sbt "runMain graft.tools.BenchExtra plans <outDir> <suffix> [onlyQuery...]"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val scratch = if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm/graft-benchextra"
    else "/tmp/graft-benchextra"
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "time"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    // same warmup as Bench: JIT/codegen/session-init paths exercised
    graft.Dedup.pipeline(spark, graft.sources.TranscriptGen.df(spark, 5000L),
      graft.DedupConfig()).count()

    mode match {
      case "time" =>
        val reps = if (args.length > 1) args(1).toInt else 1
        val only = args.drop(2).toSet
        val qs = SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => only.isEmpty || only.contains(n) }
        val out = qs.map { case (name, fn) =>
          val ts = (1 to reps).map { _ =>
            time {
              try { fn(spark, sfDir).count(); () }
              catch { case e: Throwable => System.err.println(s"[benchextra] $name failed: ${e.getMessage}") }
            }
          }
          spark.sparkContext.setJobDescription(null)
          name -> ts
        }
        val json = out.map { case (k, ts) =>
          "\"" + k + "\":" + ts.map(t => f"$t%.2f").mkString("[", ",", "]")
        }.mkString("{", ",", "}")
        println(s"""BENCHEXTRA_JSON={"sf":"$sfDir","cpus":$cpus,"queries":$json}""")

      case "opplans" =>
        // operator-level plans: the declared queries localCheckpoint their
        // intermediates eagerly, so their returned plans are truncated at
        // in-memory scans — these entries expose the operator subtrees the
        // optimization round actually changed (assembly, candidate scan,
        // verify, streaming band join) as explain("formatted") artifacts.
        val outDir = args(1)
        val suffix = args(2)
        Files.createDirectories(Paths.get(outDir))
        import org.apache.spark.sql.functions._
        val cfg = graft.DedupConfig()
        val transcripts = graft.sources.TranscriptGen.df(spark, 2000L)
        val sigs = graft.Dedup.signatures(spark, graft.Dedup.documents(transcripts), cfg)
          .localCheckpoint(true)
        val repBands = graft.Dedup.repBands(sigs).localCheckpoint(true)
        val index = sigs.filter(col("conv_id") < "conv-00001000")
        val stream = sigs.filter(col("conv_id") >= "conv-00001000")
        val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
          ("op_assembly", () => graft.Dedup.documents(transcripts)),
          ("op_assembly_full", () => graft.operators.Assembly.assemble(transcripts)),
          ("op_signatures", () => graft.Dedup.signatures(spark, graft.Dedup.documents(transcripts), cfg)),
          ("op_repgroups", () => graft.Dedup.repGroups(sigs)),
          ("op_candidates", () => graft.Dedup.candidates(repBands, cfg)),
          ("op_verify", () => graft.Dedup.verify(graft.Dedup.candidates(repBands, cfg), sigs, cfg)),
          ("op_stream_neardup", () => graft.streaming.StreamingDedup.nearDupAgainstIndex(stream, index, cfg))
        )
        ops.foreach { case (name, fn) =>
          try {
            val plan = fn().queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
            println(s"[benchextra] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[benchextra] $name plan failed: ${e.getMessage}")
          }
        }

      case "plans" =>
        val outDir = args(1)
        val suffix = args(2)
        val only = args.drop(3).toSet
        Files.createDirectories(Paths.get(outDir))
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => only.isEmpty || only.contains(n) }
          .foreach { case (name, fn) =>
            try {
              val df = fn(spark, sfDir)
              val plan = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
              println(s"[benchextra] wrote $name")
            } catch { case e: Throwable =>
              System.err.println(s"[benchextra] $name plan failed: ${e.getMessage}")
            }
          }
    }
    spark.stop()
  }
}
