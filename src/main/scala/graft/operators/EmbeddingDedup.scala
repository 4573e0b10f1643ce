package graft.operators

import graft.DedupConfig
import graft.kernels.CosineLshModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection — the dense-vector sibling of
  * the MinHash/Jaccard text pipeline: the reference's CosineLsh scheme
  * (`/root/reference/elastiknn-models/src/main/java/com/klibisz/elastiknn/models/CosineLshModel.java:26-52`)
  * applied to the *self-join dedup* read shape instead of the knn shape.
  *
  * Pipeline: hyperplane band hashes per vector → the skew-safe streaming
  * bucket scan of [[CandidatePairs]] (hot buckets take the salted block
  * decomposition — a near-dup-dense embedding corpus concentrates whole
  * clusters into single buckets, exactly the skew case that machinery
  * exists for) → exact-cosine re-score of candidates (precision 1.0 by
  * construction; recall is the LSH operating point, pinned by test).
  *
  * Scale shape (100 TB): the bands exchange carries (id, band) only; the
  * verify joins re-attach the embedding payload per side keyed by id, so
  * payload bytes move in proportion to candidate density, never corpus².
  */
object EmbeddingDedup {

  /** Hyperplane-LSH band signatures (vec_id, bands: Array[Long]) — the
    * model is hoisted once per partition (plane table is numTables ×
    * rowsPerBand × dims floats, built from the seed, never shuffled).
    */
  def bandSignatures(spark: SparkSession, emb: DataFrame, numTables: Int, rowsPerBand: Int,
                     seed: Long = 0L, dims: Int = -1): DataFrame = {
    import spark.implicits._
    val d = if (dims > 0) dims else emb.select(size(col("embedding"))).first().getInt(0)
    emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val model = new CosineLshModel(d, numTables, rowsPerBand, seed)
        iter.map { case (id, e) => (id, model.hash(e)) }
      }
      .toDF("vec_id", "bands")
  }

  /** Near-dup pairs (id_a < id_b, exact cosine ≥ theta). One shared band
    * suffices for candidacy (recall-first; the exact re-score makes the
    * threshold decision).
    *
    * Verify shape (same discipline as the MinHash `VerifyPairs` path —
    * ONE payload-carrying exchange): the corpus is reduced to candidate
    * members via a broadcast-distinct-id semi-join (no payload moves, the
    * id set is ~8 B/row), join 1 streams the member embeddings against
    * the BROADCAST pair list (no exchange), and join 2 — the only
    * embedding-carrying exchange — meets the join-1 output and the member
    * payload in a shuffled hash join on id_b. Without the explicit hints,
    * checkpoint-derived size estimates would shuffle the FULL corpus
    * embedding column on vec_id.
    */
  def dupPairs(spark: SparkSession, emb: DataFrame, theta: Double,
               numTables: Int = 16, rowsPerBand: Int = 8, seed: Long = 0L,
               dims: Int = -1, bucketCap: Int = 512): DataFrame = {
    if (dims <= 0 && emb.select(col("embedding")).head(1).isEmpty)
      // degrade like every other operator: empty corpus → empty result
      // (the dims probe below would otherwise throw on .first())
      return emb.sparkSession.emptyDataFrame
        .withColumn("id_a", lit(0L)).withColumn("id_b", lit(0L))
        .withColumn("cosine", lit(0.0)).limit(0)
    // zero-padded string ids (19 digits covers every non-negative Long):
    // CandidatePairs' binary-UTF8 pair order then equals the numeric
    // order, so id_a < id_b survives the cast back. Negative vec_ids
    // would break that invariant ('-' sorts above digits) — the id
    // contract is non-negative, same as the testdata and oracle.
    val sigs = bandSignatures(spark, emb, numTables, rowsPerBand, seed, dims)
      .select(lpad(col("vec_id").cast("string"), 19, "0").as("conv_id"), col("bands"))
    val cfg = DedupConfig(numTables = numTables, rowsPerBand = rowsPerBand,
      seed = seed, minBands = 1, bucketCap = bucketCap)
    val cand = CandidatePairs.candidatePairs(sigs, cfg)
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
      .localCheckpoint(true)
    val ids = cand.select(col("id_a").as("vec_id"))
      .unionByName(cand.select(col("id_b").as("vec_id")))
    val members = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .join(broadcast(ids.distinct()), Seq("vec_id"), "left_semi")
      .localCheckpoint(true)
    val memberA = members.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val memberB = members.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    memberA.join(broadcast(cand), Seq("id_a"))
      .hint("shuffle_hash")
      .join(memberB, Seq("id_b"))
      .withColumn("cosine", Knn.cosineCol("emb_a", "emb_b"))
      .filter(col("cosine") >= theta)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Every vector labeled with its near-dup cluster (min member id), via
    * the same connected-components used by the text pipeline.
    */
  def clusters(spark: SparkSession, emb: DataFrame, theta: Double,
               numTables: Int = 16, rowsPerBand: Int = 8, seed: Long = 0L,
               dims: Int = -1, bucketCap: Int = 512): DataFrame = {
    val pairs = dupPairs(spark, emb, theta, numTables, rowsPerBand, seed, dims, bucketCap)
      .select(lpad(col("id_a").cast("string"), 19, "0").as("id_a"),
        lpad(col("id_b").cast("string"), 19, "0").as("id_b"))
    val all = emb.select(lpad(col("vec_id").cast("string"), 19, "0").as("conv_id"))
    ConnectedComponents.assign(all, pairs)
      .select(col("conv_id").cast("long").as("vec_id"), col("cluster_id").cast("long").as("cluster_id"))
  }
}
