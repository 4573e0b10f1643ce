package graft.operators

import graft.DedupConfig
import graft.kernels.{ExactSim, Lcs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact re-scoring of candidate pairs — ≙ the reference's C5
  * (`MatchHashesAndScoreQuery.java:100-130` scorer +
  * `HashingQuery.scala:23-38` exact-function closure): decode the stored
  * payload, apply the exact similarity, keep survivors.
  *
  * In batch form: join the candidate pairs back to the signatures table
  * (which still carries the shingle sets — the ≙binary-doc-value payload)
  * on each side, apply the exact Jaccard kernel, filter at θ. Precision of
  * the final pair set is 1.0 by construction (every emitted pair is exactly
  * verified); recall is owned by the banding config upstream.
  */
object VerifyPairs {

  private val jaccardUdf = udf { (a: Array[Long], b: Array[Long]) =>
    ExactSim.jaccard(if (a == null) Array.empty[Long] else a, if (b == null) Array.empty[Long] else b)
  }

  private val hamming64Udf = udf { (a: Long, b: Long) => ExactSim.hammingSim64(a, b) }

  /** @param pairs (id_a, id_b, matching_bands)
    * @param sigs  signatures with (conv_id, shingles, simhash)
    * @return (id_a, id_b, matching_bands, jaccard, simhash_sim) filtered at θ
    *
    * The pairs side carries a `shuffle_hash` hint: the payload side holds
    * the full shingle arrays, and Catalyst's size estimate for a
    * checkpointed plan badly undercounts array columns — without the hint
    * it broadcasts the entire signatures table (driver-serial collect,
    * OOM-by-maxResultSize at scale). A shuffled hash join keeps both sides
    * distributed and builds on the (typically much smaller) pairs side.
    */
  def verify(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val payload = sigs.select(col("conv_id"), col("shingles"), col("simhash"))
    pairs.hint("shuffle_hash")
      .join(payload.withColumnRenamed("conv_id", "id_a")
                   .withColumnRenamed("shingles", "sh_a")
                   .withColumnRenamed("simhash", "fp_a"), Seq("id_a"))
      .hint("shuffle_hash")
      .join(payload.withColumnRenamed("conv_id", "id_b")
                   .withColumnRenamed("shingles", "sh_b")
                   .withColumnRenamed("simhash", "fp_b"), Seq("id_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .withColumn("simhash_sim", hamming64Udf(col("fp_a"), col("fp_b")))
      .filter(col("jaccard") >= cfg.theta)
      .select("id_a", "id_b", "matching_bands", "jaccard", "simhash_sim")
  }

  /** Exact verification without the θ filter — exposes the raw scores for
    * diagnostics and threshold tuning (≙ the reference's function-score
    * variant Q5: score without filtering).
    */
  def score(pairs: DataFrame, sigs: DataFrame): DataFrame = {
    val payload = sigs.select(col("conv_id"), col("shingles"), col("simhash"))
    pairs.hint("shuffle_hash")
      .join(payload.withColumnRenamed("conv_id", "id_a")
                   .withColumnRenamed("shingles", "sh_a")
                   .withColumnRenamed("simhash", "fp_a"), Seq("id_a"))
      .hint("shuffle_hash")
      .join(payload.withColumnRenamed("conv_id", "id_b")
                   .withColumnRenamed("shingles", "sh_b")
                   .withColumnRenamed("simhash", "fp_b"), Seq("id_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .withColumn("simhash_sim", hamming64Udf(col("fp_a"), col("fp_b")))
      .select("id_a", "id_b", "matching_bands", "jaccard", "simhash_sim")
  }

  private val lcsRatioUdf = udf { (a: String, b: String) =>
    Lcs.lcsRatio(if (a == null) "" else a, if (b == null) "" else b)
  }

  /** Suffix-automaton LCS pass over *borderline* verified pairs (SURVEY
    * §7.2): pairs with θ ≤ jaccard < `borderlineBelow` additionally get a
    * normalized longest-common-substring ratio from the raw document text.
    * Bounded input set by construction — never run all-pairs.
    *
    * @param verified output of [[verify]]
    * @param docs     (conv_id, doc_text)
    */
  def lcsPass(verified: DataFrame, docs: DataFrame, borderlineBelow: Double = 0.9): DataFrame = {
    val texts = docs.select(col("conv_id"), col("doc_text"))
    val borderline = verified.filter(col("jaccard") < borderlineBelow)
    val scored = borderline.hint("shuffle_hash")
      .join(texts.withColumnRenamed("conv_id", "id_a").withColumnRenamed("doc_text", "t_a"), Seq("id_a"))
      .hint("shuffle_hash")
      .join(texts.withColumnRenamed("conv_id", "id_b").withColumnRenamed("doc_text", "t_b"), Seq("id_b"))
      .withColumn("lcs_ratio", lcsRatioUdf(col("t_a"), col("t_b")))
      .select("id_a", "id_b", "matching_bands", "jaccard", "simhash_sim", "lcs_ratio")
    verified.filter(col("jaccard") >= borderlineBelow)
      .withColumn("lcs_ratio", lit(1.0))
      .unionByName(scored)
  }
}
