package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query AST + planner — the analog of the reference's
  * `NearestNeighborsQuery` sealed trait
  * (`/root/reference/elastiknn-api4s/.../api/NearestNeighborsQuery.scala:13-61`)
  * and the (query, mapping) compatibility dispatch in
  * `ElastiknnQueryBuilder.build` (`ElastiknnQueryBuilder.scala:38-92`):
  * a sealed config ADT selects and wires pipeline stages; incompatible
  * combinations fail at *plan* time with `IllegalArgumentException`,
  * mirroring the reference's compat matrix (`docs/pages/api.md:689-715`).
  */
object Queries {

  /** What a corpus column contains — ≙ the reference's `Mapping` datatype half. */
  sealed trait CorpusKind
  /** Text documents (conv_id/doc_id + text) → set semantics. */
  case object TextCorpus extends CorpusKind
  /** Dense float embeddings (vec_id + embedding) → vector semantics. */
  case object VectorCorpus extends CorpusKind

  /** The query ADT — ≙ NearestNeighborsQuery cases, re-grounded for batch. */
  sealed trait DedupQuery { def corpus: CorpusKind }
  /** All-pairs exact dedup via content hash (group-by, no LSH). */
  final case class ExactDedup() extends DedupQuery { val corpus: CorpusKind = TextCorpus }
  /** MinHash/Jaccard near-dup pipeline (≙ NearestNeighborsQuery.JaccardLsh). */
  final case class MinHashDedup(cfg: DedupConfig = DedupConfig()) extends DedupQuery { val corpus: CorpusKind = TextCorpus }
  /** SimHash/Hamming near-dup pipeline (≙ HammingLsh). */
  final case class SimHashDedup(cfg: DedupConfig = DedupConfig(), minSim: Double = 0.9) extends DedupQuery { val corpus: CorpusKind = TextCorpus }
  /** Embedding-cosine near-dup pipeline (≙ CosineLsh re-grounded to the
    * self-join dedup shape rather than knn).
    */
  final case class CosineDedup(theta: Double = 0.9, numTables: Int = 16,
                               rowsPerBand: Int = 8) extends DedupQuery { val corpus: CorpusKind = VectorCorpus }
  /** Exact brute-force knn (≙ NearestNeighborsQuery.Exact). */
  final case class ExactKnn(k: Int, queriesFilter: DataFrame => DataFrame = identity) extends DedupQuery { val corpus: CorpusKind = VectorCorpus }
  /** Hyperplane-LSH knn (≙ CosineLsh). */
  final case class CosineLshKnn(k: Int, numTables: Int = 32, rowsPerBand: Int = 8,
                                queriesFilter: DataFrame => DataFrame = identity) extends DedupQuery { val corpus: CorpusKind = VectorCorpus }
  /** knn by indexed vector id (≙ `Vec.Indexed`, `Vec.scala:80`): the query
    * vector lives in the corpus and is resolved by id — the reference's
    * async fetch-then-rewrite (`ElasticsearchQueryBuilder.scala` rewrite
    * phase) re-grounded as a batch join/filter against the corpus table.
    */
  final case class KnnById(ids: Seq[Long], k: Int) extends DedupQuery { val corpus: CorpusKind = VectorCorpus }
  /** IVF-partitioned knn (the batch scale path). */
  final case class IvfKnn(k: Int, nCells: Int = 16, nProbe: Int = 4,
                          queriesFilter: DataFrame => DataFrame = identity) extends DedupQuery { val corpus: CorpusKind = VectorCorpus }

  /** Plan + execute a query against a corpus DataFrame. Text queries expect
    * (conv_id, doc_text); vector queries expect (vec_id, embedding).
    * ≙ ElastiknnQueryBuilder.build: the single pattern match that rejects
    * incompatible (query, corpus) pairs before any execution.
    */
  def run(spark: SparkSession, corpus: DataFrame, query: DedupQuery): DataFrame = {
    val isText = corpus.columns.contains("doc_text")
    val isVec = corpus.columns.contains("embedding")
    (query, isText, isVec) match {
      case (q, false, _) if q.corpus == TextCorpus =>
        throw new IllegalArgumentException(
          s"$q requires a text corpus with (conv_id, doc_text); got [${corpus.columns.mkString(",")}]")
      case (q, _, false) if q.corpus == VectorCorpus =>
        throw new IllegalArgumentException(
          s"$q requires a vector corpus with (vec_id, embedding); got [${corpus.columns.mkString(",")}]")

      case (ExactDedup(), _, _) =>
        TextAnalysis.exactDedup(corpus, idCol = "conv_id", textCol = "doc_text")

      case (MinHashDedup(cfg), _, _) =>
        val sigs = Dedup.signatures(spark, corpus, cfg).localCheckpoint(eager = true)
        val mapping = Dedup.exactGroups(sigs)
        // bands-only rep aggregation; payload re-attached member-reduced in
        // verify (same shape as Dedup.pipeline)
        val verified = Dedup.verify(Dedup.candidates(Dedup.repBands(sigs), cfg), sigs, cfg)
        val reps = mapping.select(col("rep").as("conv_id")).distinct()
        val repClusters = ConnectedComponents.assign(reps, verified)
        mapping.join(repClusters.withColumnRenamed("conv_id", "rep").select(col("rep"), col("cluster_id")), Seq("rep"))
          .select(col("conv_id"), col("cluster_id"))

      case (SimHashDedup(cfg, minSim), _, _) =>
        val sigs = Dedup.signatures(spark, corpus, cfg).localCheckpoint(eager = true)
        val bandUdf = udf { (fp: Long) => graft.kernels.SimHashModel.bands(fp, cfg.simHashBands) }
        // bands only on the self-join shuffle; fingerprints join back AFTER
        // the pair aggregation (same shape as the MinHash verify path —
        // the exchange carries ids, not payload, however narrow)
        val banded = sigs.select(col("conv_id"), explode(bandUdf(col("simhash"))).as("band"))
        val pairs = banded.select(col("band"), col("conv_id").as("id_a"))
          .join(banded.select(col("band"), col("conv_id").as("id_b")), Seq("band"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("matching_bands"))
        val fps = sigs.select(col("conv_id"), col("simhash"))
        val hammingSim = udf { (a: Long, b: Long) => graft.kernels.ExactSim.hammingSim64(a, b) }
        pairs
          .join(fps.select(col("conv_id").as("id_a"), col("simhash").as("fp_a")), Seq("id_a"))
          .join(fps.select(col("conv_id").as("id_b"), col("simhash").as("fp_b")), Seq("id_b"))
          .withColumn("simhash_sim", hammingSim(col("fp_a"), col("fp_b")))
          .filter(col("simhash_sim") >= minSim)
          .select("id_a", "id_b", "simhash_sim")

      case (CosineDedup(theta, l, r), _, _) =>
        EmbeddingDedup.dupPairs(spark, corpus, theta, numTables = l, rowsPerBand = r)

      case (ExactKnn(k, qf), _, _) =>
        Knn.exactTopK(qf(corpus), corpus, k)

      case (KnnById(ids, k), _, _) =>
        Knn.exactTopK(corpus.filter(col("vec_id").isin(ids: _*)), corpus, k)

      case (CosineLshKnn(k, l, r, qf), _, _) =>
        Knn.lshTopK(spark, qf(corpus), corpus, k, numTables = l, rowsPerBand = r)

      case (IvfKnn(k, cells, probe, qf), _, _) =>
        Knn.ivfTopK(qf(corpus), corpus, k, nCells = cells, nProbe = probe)
    }
  }
}
