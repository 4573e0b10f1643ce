package graft.operators

import graft.kernels.{CosineLshModel, ExactSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbor operators over an embedding column
  * (`Array[Float]`) — the dense-float path (≙ `Vec.DenseFloat`,
  * `/root/reference/elastiknn-api4s/.../api/Vec.scala:45-63`).
  *
  *   - [[exactTopK]] — brute-force scored scan ≙ the reference's exact query
  *     (`ExactQuery.scala:18-50`): ground truth, O(queries × corpus).
  *   - [[lshTopK]] — hyperplane-LSH bucketed ANN ≙ CosineLsh read path
  *     (`HashingQuery` C1–C5): candidates from shared hash buckets, exact
  *     re-score, per-query top-k window with deterministic tiebreak
  *     (≙ doc-id-order emission, `ArrayHitCounter.java:119-134`).
  *   - [[ivfTopK]] — IVF-style coarse quantization: deterministic centroid
  *     pick, nProbe nearest cells per query, exact re-score within cells.
  *     The scale path for 100 TB embedding corpora (cells are the shuffle
  *     partitioning; no all-pairs).
  */
object Knn {

  /** Similarity column expression, codegen-friendly (no UDF): double-sum
    * dot/cosine via zip_with + aggregate over the float arrays.
    */
  def cosineCol(a: String, b: String) = {
    val dot = aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(col(a), x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(col(b), x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x)
    dot / sqrt(na * nb)
  }

  def dotCol(a: String, b: String) =
    aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2DistCol(a: String, b: String) =
    sqrt(aggregate(zip_with(col(a), col(b), (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x))

  def l1DistCol(a: String, b: String) =
    aggregate(zip_with(col(a), col(b), (x, y) => abs(x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Brute-force top-k cosine neighbors for each query vector.
    * Queries are broadcast (small side); the corpus streams — one pass, no
    * quadratic shuffle.
    */
  def exactTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosineCol("q_emb", "n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("sim"), 6).as("sim"))
  }

  /** Hyperplane-LSH ANN: both sides hash with the seeded CosineLshModel;
    * candidates = pairs sharing ≥1 band bucket; exact cosine re-score;
    * per-query top-k. Recall grows with L exactly as in the reference
    * (`RecallSuite.scala:59-91` trades L for recall).
    */
  def lshTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int,
              numTables: Int = 32, rowsPerBand: Int = 8, seed: Long = 0L): DataFrame = {
    import spark.implicits._
    val dims = corpus.select(size(col("embedding"))).first().getInt(0)

    def withBands(df: DataFrame, idCol: String): DataFrame = {
      val in = df.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      in.mapPartitions { iter =>
        val model = new CosineLshModel(dims, numTables, rowsPerBand, seed) // hoisted once per partition
        iter.flatMap { case (id, emb) => model.hash(emb).map(b => (id, b)) }
      }.toDF(idCol, "band")
    }

    val qBands = withBands(queries, "q_id")
    val cBands = withBands(corpus, "n_id")
    // hash-join on band (the shuffle is the term dictionary, C1)
    val cands = qBands.join(cBands, Seq("band"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(count(lit(1)).as("matching_bands")) // C2 hit counting

    val q = queries.select(col("vec_id").cast("long").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").cast("long").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("n_id"))
    cands
      .join(broadcast(q), Seq("q_id"))
      .join(c, Seq("n_id"))
      .withColumn("sim", cosineCol("q_emb", "n_emb")) // C5 exact re-score
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("sim"), 6).as("sim"),
        col("matching_bands"))
  }

  /** IVF-style ANN: `nCells` centroids picked deterministically (the first
    * nCells corpus vectors by id — seed-free and reproducible), every corpus
    * vector assigned to its nearest centroid (broadcast centroids, one
    * narrow pass), queries probe their `nProbe` nearest cells, exact
    * re-score within probed cells only.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy("vec_id").limit(nCells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid")))

    // corpus → nearest cell (rank 1 by cosine to centroid)
    val wc = Window.partitionBy(col("n_id")).orderBy(desc("csim"), asc("cell_id"))
    val assigned = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .crossJoin(centroids)
      .withColumn("csim", cosineCol("n_emb", "centroid"))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") === 1)
      .select(col("cell_id"), col("n_id"), col("n_emb"))

    // queries → nProbe nearest cells
    val wq = Window.partitionBy(col("q_id")).orderBy(desc("csim"), asc("cell_id"))
    val probes = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(centroids)
      .withColumn("csim", cosineCol("q_emb", "centroid"))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nProbe)
      .select(col("cell_id"), col("q_id"), col("q_emb"))

    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("n_id"))
    broadcast(probes).join(assigned, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosineCol("q_emb", "n_emb"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("sim"), 6).as("sim"))
  }
}
