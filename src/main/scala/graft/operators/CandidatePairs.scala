package graft.operators

import graft.DedupConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** (band, conv_id) posting rows with per-band bucket size `n` attached
    * via a single window shuffle (reused by both the small and salted path).
    */
  private def postings(sigs: DataFrame): DataFrame = {
    sigs
      .select(col("conv_id"), explode(col("bands")).as("band"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("band")))
      .filter(col("n") >= 2) // singleton buckets produce no pairs
  }

  /** All unordered candidate pairs (id_a < id_b) with the number of
    * matching bands. Complete (no recall loss from capping).
    */
  def candidatePairs(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val posts = postings(sigs)

    // ---- small buckets: direct within-bucket enumeration ----
    val smallPairs = posts
      .filter(col("n") <= cfg.bucketCap)
      .groupBy(col("band"))
      .agg(sort_array(collect_list(col("conv_id"))).as("ids"))
      .select(explodePairs(col("ids")).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))

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

    val bigPairs = lhs
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

  /** All (i<j) pairs from a sorted id array, as a generator column.
    * Uses SQL higher-order functions (codegen-friendly, no UDF): for each
    * position i, pair ids(i) with every later element.
    */
  private def explodePairs(ids: Column): Column = {
    explode(flatten(transform(
      ids,
      (x, i) => transform(slice(ids, i + 2, size(ids)), y => struct(x.as("_1"), y.as("_2")))
    )))
  }
}
