package graft

import graft.kernels.ExactSim
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public facade of the engine (≙ the reference's client surface,
  * `ElastiknnRequests.scala:32-88`, re-grounded as DataFrame→DataFrame
  * stages — SURVEY §2.7): assemble → signatures → candidates → verify →
  * clusters, plus the exact brute-force oracle (≙ C7 `ExactQuery`).
  */
object Dedup {

  /** Transcripts (conv_id, turn_idx, role, text, tool, ts) → one document
    * row per conversation.
    */
  def documents(transcripts: DataFrame): DataFrame = Assembly.assemble(transcripts)

  /** Documents (conv_id, doc_text[, n_turns]) → signatures (shingles, bands,
    * simhash).
    */
  def signatures(spark: SparkSession, docs: DataFrame, cfg: DedupConfig): DataFrame =
    Signatures.signatures(spark, docs, cfg)

  /** Signatures → candidate pairs (id_a < id_b, matching_bands ≥ minBands). */
  def candidates(sigs: DataFrame, cfg: DedupConfig): DataFrame =
    CandidatePairs.candidatePairs(sigs, cfg)

  /** Candidate pairs → exactly verified pairs (jaccard ≥ θ). */
  def verify(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame =
    VerifyPairs.verify(pairs, sigs, cfg)

  /** Verified pairs + full corpus → (conv_id, cluster_id, is_canonical). */
  def clusters(allDocs: DataFrame, verifiedPairs: DataFrame): DataFrame =
    ConnectedComponents.assign(allDocs, verifiedPairs)

  /** The whole pipeline: transcripts → cluster assignment. */
  def pipeline(spark: SparkSession, transcripts: DataFrame, cfg: DedupConfig): DataFrame = {
    val docs = documents(transcripts)
    val sigs = signatures(spark, docs, cfg)
    val pairs = candidates(sigs, cfg)
    val verified = verify(pairs, sigs, cfg)
    clusters(docs, verified)
  }

  private val jaccardUdf = udf { (a: Array[Long], b: Array[Long]) =>
    ExactSim.jaccard(if (a == null) Array.empty[Long] else a, if (b == null) Array.empty[Long] else b)
  }

  /** Exact all-pairs Jaccard ≥ θ — the brute-force ground-truth oracle
    * (≙ the reference's exact query, `ExactQuery.scala:18-50`, and the
    * RecallSuite's precomputed exact neighbors). O(n²): small-sf tests only.
    *
    * The cheap size-ratio bound `θ·|b| ≤ |a| ≤ |b|/θ` (necessary for
    * jaccard ≥ θ) is applied as a codegen'd predicate before the kernel —
    * except when both sets are empty (jaccard = 1 by contract).
    */
  def exactAllPairs(sigs: DataFrame, theta: Double): DataFrame = {
    val a = sigs.select(col("conv_id").as("id_a"), col("shingles").as("sh_a"), col("n_shingles").as("n_a"))
    val b = sigs.select(col("conv_id").as("id_b"), col("shingles").as("sh_b"), col("n_shingles").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(
        (col("n_a") >= lit(theta) * col("n_b") && col("n_b") >= lit(theta) * col("n_a")) ||
          (col("n_a") === 0 && col("n_b") === 0)
      )
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= theta)
      .select("id_a", "id_b", "jaccard")
  }
}
