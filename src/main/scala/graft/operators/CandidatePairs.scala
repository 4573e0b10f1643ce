package graft.operators

import graft.DedupConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate-pair generation: the batch re-grounding of the reference's
  * inverted-index read path.
  *
  *   - `explode(bands)` → (band, conv_id) rows ≙ Lucene term postings
  *     (S5 / C1: the hash-partitioned shuffle *is* the term dictionary)
  *   - within-bucket pair enumeration ≙ the postings scan (C1)
  *   - `groupBy(idA, idB).count` ≙ per-doc hit counting (C2,
  *     `MatchHashesAndScoreQuery.java:62-82`)
  *   - `matches >= minBands` ≙ the kth-greatest candidate threshold (C3/C4),
  *     global rather than per-segment (SURVEY §4: recall can only improve)
  *
  * **Skew is handled explicitly** (SURVEY §7.4): hot buckets (boilerplate
  * text, empty-doc sentinel bands) blow up quadratically, and AQE's skew
  * join cannot split a `collect_list` hot key. Buckets larger than
  * `bucketCap` take a salted two-phase path: ids are deterministically
  * chunked, (chunkI ≤ chunkJ) block keys are exploded on both sides, and the
  * quadratic enumeration runs as an equi-join over (band, ci, cj) — spread
  * across ~g²/2 shuffle keys instead of one. **No pairs are lost**: the
  * block decomposition covers every (i < j) pair exactly once.
  */
object CandidatePairs {

  /** (band, conv_id) posting rows with per-band bucket size `n` attached.
    * The size comes from a map-side-combinable groupBy count hash-joined
    * back (build side = the small counts table) — deliberately NOT a window:
    * a window over `band` sorts every posting row inside skew-prone band
    * partitions, while this shape streams the postings unsorted.
    */
  private def postings(sigs: DataFrame): DataFrame = {
    // One explicit hash exchange on band; the counts aggregation AND the
    // count join both see HashPartitioning(band) satisfied, so the posting
    // rows shuffle ONCE (ReuseExchange shares the single write between the
    // two consumers) instead of once for the agg and again for the join —
    // at L=48 × 300k docs that's ~13M rows of shuffle saved per run.
    val rows = sigs.select(col("conv_id"), explode(col("bands")).as("band"))
      .repartition(col("band"))
    val counts = rows.groupBy(col("band")).agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    rows.join(counts.hint("shuffle_hash"), Seq("band")) // drops singleton buckets
  }

  /** All unordered candidate pairs (id_a < id_b) with the number of
    * matching bands. Complete (no recall loss from capping).
    */
  def candidatePairs(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val posts = postings(sigs)

    // ---- small buckets: within-bucket enumeration as a band self-join ----
    // (codegen'd, no per-bucket array materialization, and AQE can
    // skew-split the join where a band runs hot)
    val small = posts.filter(col("n") <= cfg.bucketCap)
    val smallPairs = small.select(col("band"), col("conv_id").as("id_a"))
      .join(small.select(col("band"), col("conv_id").as("id_b")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    // ---- oversized buckets: salted block decomposition ----
    val big = posts
      .filter(col("n") > cfg.bucketCap)
      .withColumn("g", ceil(col("n") / cfg.bucketCap).cast("int"))
      .withColumn("chunk", pmod(xxhash64(col("conv_id")), col("g")).cast("int"))

    // left replica: row with chunk ci participates in blocks (ci, cj) ∀ cj ≥ ci
    val lhs = big
      .withColumn("cj", explode(sequence(col("chunk"), col("g") - 1)))
      .select(col("band"), col("chunk").as("ci"), col("cj"), col("conv_id").as("id_a"))
    // right replica: row with chunk cj participates in blocks (ci, cj) ∀ ci ≤ cj
    val rhs = big
      .withColumn("ci", explode(sequence(lit(0), col("chunk"))))
      .select(col("band"), col("ci"), col("chunk").as("cj"), col("conv_id").as("id_b"))

    // shuffle_hash: both replicas are wide fan-outs of the postings — never
    // broadcastable, and checkpoint-derived size estimates can't be trusted
    val bigPairs = lhs.hint("shuffle_hash")
      .join(rhs, Seq("band", "ci", "cj"))
      .filter(
        // same chunk: strict order avoids self+duplicate pairs; cross-chunk:
        // every pair appears exactly once (ci<cj), order normalized below
        (col("ci") === col("cj") && col("id_a") < col("id_b")) ||
          (col("ci") =!= col("cj") && col("id_a") =!= col("id_b"))
      )
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b")
      )

    // ---- candidate aggregation (hit counting, C2) + threshold (C3/C4) ----
    smallPairs
      .unionByName(bigPairs)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("int").as("matching_bands"))
      .filter(col("matching_bands") >= cfg.minBands)
  }

  /** Per-band bucket-size metrics (diagnostics; ≙ the reference's explain
    * output C8 re-grounded as data).
    */
  def bucketMetrics(sigs: DataFrame): DataFrame = {
    sigs
      .select(explode(col("bands")).as("band"))
      .groupBy("band").agg(count(lit(1)).as("bucket_size"))
      .groupBy("bucket_size").agg(count(lit(1)).as("n_buckets"))
      .orderBy(desc("bucket_size"))
  }

}
