package graft.operators

import graft.DedupConfig
import graft.kernels.{MinHashModel, Shingler, SimHashModel}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One signature row (≙ the reference's indexed document: exact payload +
  * hash terms, SURVEY §2.1 S4/S5).
  */
final case class SignatureRow(
    conv_id: String,
    n_turns: Int,
    shingles: Array[Long],
    n_shingles: Int,
    bands: Array[Long],
    simhash: Long,
    set_hash: Long
)

/** The signatures stage — the batch analog of the reference's write path
  * (`HashingQuery.scala:88-100` turning a vector into stored hash terms).
  *
  * `mapPartitions` kernel with the MinHash model instantiated **once per
  * partition** from the seed — the same hoist-the-decoder/derive-from-seed
  * pattern the reference uses (`StoredVecReader.scala:9-11` one-time decode,
  * `ModelCache.scala:17-21` seeded recompute). Nothing is broadcast but the
  * tiny config captured in the closure; no shuffle is introduced (narrow
  * map over whatever partitioning the docs already have).
  *
  * Output columns:
  *   - `shingles: Array[Long]` — sorted distinct shingle hashes (the
  *     ≙Vec.SparseBool payload, kept for the exact-verify stage ≙ the
  *     reference's binary doc-value S4)
  *   - `bands: Array[Long]` — L MinHash band hashes (≙ the L Lucene terms)
  *   - `simhash: Long` — 64-bit SimHash fingerprint (Hamming path)
  */
object Signatures {

  /** docs must have (conv_id, doc_text[, n_turns]). */
  def signatures(spark: SparkSession, docs: DataFrame, cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    val hasTurns = docs.columns.contains("n_turns")
    val in: org.apache.spark.sql.Dataset[(String, String, Int)] =
      if (hasTurns) docs.selectExpr("conv_id", "coalesce(doc_text, '') as doc_text", "n_turns").as[(String, String, Int)]
      else docs.selectExpr("conv_id", "coalesce(doc_text, '') as doc_text", "cast(-1 as int) as n_turns").as[(String, String, Int)]
    in.mapPartitions { iter =>
      // Model instantiated once per partition, derived from seed only.
      val model = new MinHashModel(cfg.numTables, cfg.rowsPerBand, cfg.seed)
      iter.map { case (convId, text, nTurns) =>
        val sh = Shingler.shingles(text, cfg.shingleK, cfg.shingleMode, cfg.seed)
        // set_hash: order-canonical 64-bit digest of the (sorted) shingle
        // set — the exact-duplicate group key. Docs with equal shingle sets
        // have Jaccard 1 by definition, so collapsing them to one
        // representative before LSH is lossless for the pair/cluster
        // semantics and removes the quadratic blow-up of giant exact-dup
        // cliques (e.g. empty documents).
        var setHash = 0x243f6a8885a308d3L ^ cfg.seed
        var i = 0
        while (i < sh.length) { setHash = graft.kernels.Hashing.mix64(setHash, sh(i)); i += 1 }
        SignatureRow(convId, nTurns, sh, sh.length, model.bandHashes(sh), SimHashModel.fingerprint(sh, cfg.seed), setHash)
      }
    }.toDF()
  }

  /** Shingle-only signatures: (conv_id, shingles, n_shingles). The full
    * kernel additionally evaluates L·r MinHash permutations plus the 64
    * SimHash bit-votes per shingle (272 hash evaluations per element at the
    * documents-table defaults) that a shingle-shaped query throws away —
    * don't compute what you discard (guide §1.2). Identical shingling math
    * (same normalize/hash/sort/dedup), so the `shingles`/`n_shingles`
    * columns are interchangeable with the full kernel's.
    */
  def shingleSignatures(spark: SparkSession, docs: DataFrame, cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    docs.selectExpr("conv_id", "coalesce(doc_text, '') as doc_text")
      .as[(String, String)]
      .mapPartitions { iter =>
        iter.map { case (convId, text) =>
          val sh = Shingler.shingles(text, cfg.shingleK, cfg.shingleMode, cfg.seed)
          (convId, sh, sh.length)
        }
      }
      .toDF("conv_id", "shingles", "n_shingles")
  }

  /** SimHash-only signatures: (conv_id, simhash). The full kernel evaluates
    * L·r MinHash permutations per document (144 at the defaults) that a
    * SimHash-shaped query throws away — at 10^12 turns that is most of the
    * signature stage's CPU. Identical shingling and fingerprint math to the
    * full kernel (same seed → bit-identical `simhash` column), so outputs
    * are interchangeable between the two.
    */
  def simhashSignatures(spark: SparkSession, docs: DataFrame, cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    docs.selectExpr("conv_id", "coalesce(doc_text, '') as doc_text")
      .as[(String, String)]
      .mapPartitions { iter =>
        iter.map { case (convId, text) =>
          val sh = Shingler.shingles(text, cfg.shingleK, cfg.shingleMode, cfg.seed)
          (convId, SimHashModel.fingerprint(sh, cfg.seed))
        }
      }
      .toDF("conv_id", "simhash")
  }
}
