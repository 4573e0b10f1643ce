package graft.plans

import graft.{Dedup, DedupConfig}
import graft.kernels.Hashing
import graft.operators.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Durable, resumable run of the dedup pipeline for spark-submit-scale jobs:
  * each stage checkpoints to parquet with a `_lineage.json` sidecar, and a
  * rerun reuses any stage whose lineage (config hash + upstream chain)
  * matches — the restart-safety analog of the reference's
  * "derive-from-seed, never store params" philosophy (`ModelCache.scala:17-21`):
  * state that *can* be recomputed is keyed by what produced it, so a resumed
  * run either trusts a checkpoint exactly or rebuilds it.
  *
  * Layout under `workDir`:
  *   signatures/   partitioned by `bucket` = pmod(xxhash64(conv_id), nBuckets)
  *                 — a stable id-hash partitioning, so incremental/partial
  *                 reruns can address per-bucket subsets and downstream
  *                 equi-joins on conv_id start from co-located data
  *   pairs/        verified duplicate pairs (rep-level)
  *   clusters/     final (conv_id, cluster_id, is_canonical)
  * Each with `_lineage.json`: stage, config hash, upstream hash, row count,
  * wall seconds, bucket count — the per-partition lineage + metrics record.
  */
object CheckpointedPipeline {

  final case class StageInfo(name: String, rows: Long, wallSec: Double, reused: Boolean)

  private def configHash(cfg: DedupConfig, nBuckets: Int): String = {
    val s = cfg.toString + s"/buckets=$nBuckets/v1"
    java.lang.Long.toHexString(Hashing.hashString(s))
  }

  private def lineagePath(dir: String): java.nio.file.Path = Paths.get(dir, "_lineage.json")

  private def writeLineage(dir: String, stage: String, cfgHash: String, upstream: String,
                           rows: Long, wallSec: Double, nBuckets: Int,
                           extra: String = ""): Unit = {
    val json =
      s"""{"stage":"$stage","config_hash":"$cfgHash","upstream":"$upstream","rows":$rows,""" +
        f""""wall_sec":$wallSec%.3f,"n_buckets":$nBuckets$extra,"written_at_ms":${System.currentTimeMillis()}}"""
    Files.writeString(lineagePath(dir), json)
  }

  /** A stage checkpoint is reusable iff its lineage exists and records the
    * same config hash + upstream chain (parquet `_SUCCESS` is implied by the
    * sidecar being written strictly after the data).
    */
  private def reusable(dir: String, cfgHash: String, upstream: String): Boolean = {
    val p = lineagePath(dir)
    Files.exists(p) && {
      val s = Files.readString(p)
      s.contains(s""""config_hash":"$cfgHash"""") && s.contains(s""""upstream":"$upstream"""")
    }
  }

  /** Order-independent fingerprint of the input table's content: row count
    * + bit_xor and decimal-sum of per-row xxhash64 over the identity
    * columns. One narrow aggregation pass over the input — the price of
    * sound checkpoint reuse (a config-only key silently reuses stale
    * checkpoints when the same workDir is re-run against different data).
    */
  def inputFingerprint(transcripts: DataFrame): String = {
    // Identity columns = everything a checkpointed stage can derive values
    // from: Assembly emits first_ts/last_ts from ts, and a roles-aware
    // assembly reads role — a text-only key would silently reuse stale
    // checkpoints when only ts/role changed.
    // ts hashes via its string form: TIMESTAMP and TIMESTAMP_NTZ inputs
    // both cast to string (a direct cast-to-long is illegal for NTZ), and
    // the rendering is deterministic under the pinned UTC session timezone
    val cols = Seq(col("conv_id"), col("turn_idx"), coalesce(col("text"), lit(""))) ++
      (if (transcripts.columns.contains("ts")) Seq(coalesce(col("ts").cast("string"), lit(""))) else Nil) ++
      (if (transcripts.columns.contains("role")) Seq(coalesce(col("role"), lit(""))) else Nil)
    val h = xxhash64(cols: _*)
    val row = transcripts
      .agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(h), lit(0L)).as("hx"),
        coalesce(sum(h.cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("hs"))
      .first()
    val hs = java.lang.Long.toHexString(Hashing.hashString(row.get(2).toString))
    s"${row.getLong(0)}-${java.lang.Long.toHexString(row.getLong(1))}-$hs"
  }

  /** Run (or resume) the pipeline. Returns the clusters DataFrame plus
    * per-stage lineage info (rows, wall time, whether the checkpoint was
    * reused). Stage lineage keys include the input fingerprint, so a rerun
    * in the same workDir against changed data rebuilds instead of reusing
    * stale checkpoints.
    */
  def run(spark: SparkSession, transcripts: DataFrame, cfg: DedupConfig,
          workDir: String, nBuckets: Int = 64): (DataFrame, Seq[StageInfo]) = {
    Files.createDirectories(Paths.get(workDir))
    val inputFp = inputFingerprint(transcripts)
    val cfgHash = configHash(cfg, nBuckets) + "-" + inputFp
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageInfo]

    // extraLineage is evaluated AFTER the stage's write action completes —
    // runtime counters (accumulators) are only full once the job has run
    def stage(name: String, upstream: String, partitionCols: Seq[String],
              extraLineage: () => String = () => "")(compute: => DataFrame): DataFrame = {
      val dir = s"$workDir/$name"
      if (reusable(dir, cfgHash, upstream)) {
        val df = spark.read.parquet(dir)
        stages += StageInfo(name, -1L, 0.0, reused = true)
        df
      } else {
        val t0 = System.nanoTime()
        val df = compute
        val writer = df.write.mode(SaveMode.Overwrite)
        (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer).parquet(dir)
        val out = spark.read.parquet(dir)
        val rows = out.count()
        val wall = (System.nanoTime() - t0) / 1e9
        writeLineage(dir, name, cfgHash, upstream, rows, wall, nBuckets, extraLineage())
        stages += StageInfo(name, rows, wall, reused = false)
        out
      }
    }

    val sigs = stage("signatures", upstream = "transcripts", partitionCols = Seq("bucket")) {
      Dedup.signatures(spark, Dedup.documents(transcripts), cfg)
        .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(nBuckets)).cast("int"))
    }

    // skew counters land in the pairs lineage: which bands overflowed
    // bucketCap and how much work the salted path did is part of the
    // run's metrics record, not a silent internal detail
    val candMetrics = graft.operators.CandidatePairs.CandidateMetrics.register(spark)
    val pairs = stage("pairs", upstream = s"signatures/$cfgHash", partitionCols = Nil,
      extraLineage = () =>
        s""","hot_buckets":${candMetrics.hotBuckets.value},"hot_postings":${candMetrics.hotPostings.value},"salted_pairs":${candMetrics.saltedPairs.value}""") {
      // bands-only rep aggregation (same shape as Dedup.pipeline): the
      // shingle payload joins in member-reduced inside verify
      Dedup.verify(Dedup.candidates(Dedup.repBands(sigs), cfg, Some(candMetrics)), sigs, cfg)
    }

    val clusters = stage("clusters", upstream = s"pairs/$cfgHash", partitionCols = Nil) {
      val mapping = Dedup.exactGroups(sigs)
      val reps = mapping.select(col("rep").as("conv_id")).distinct()
      val repClusters = ConnectedComponents.assign(reps, pairs.select("id_a", "id_b"))
      mapping
        .join(repClusters.withColumnRenamed("conv_id", "rep").select(col("rep"), col("cluster_id")), Seq("rep"))
        .select(col("conv_id"), col("cluster_id"))
        .withColumn("is_canonical", (col("conv_id") === col("cluster_id")).cast("boolean"))
    }

    (clusters, stages.toSeq)
  }
}
