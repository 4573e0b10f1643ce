package graft

import graft.operators._
import graft.sources.TranscriptGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with DuckDB-runnable oracle SQL for every
  * SQL-expressible one. Column names and types are aligned between the
  * Spark result and the oracle (BIGINT/DOUBLE/VARCHAR only).
  */
object SparkEntry {

  /** Shared dedup config for the documents-table queries (word 3-shingles,
    * L=64 bands × r=2 rows, θ=0.8 — the banding S-curve puts detection
    * probability at 1−(1−s²)^64 ≈ 1−3e−29 for s ≥ 0.8).
    */
  private val docCfg = DedupConfig(shingleK = 3, numTables = 64, rowsPerBand = 2, theta = 0.8)

  private def documentsDf(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embeddingsDf(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def eventsDf(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** documents table → the pipeline's (conv_id, doc_text) shape; doc ids
    * zero-padded so lexicographic order == numeric order (cluster min-ids
    * and pair orientation stay consistent with the numeric oracle).
    */
  private def docsAsCorpus(s: SparkSession, dir: String): DataFrame =
    documentsDf(s, dir).select(
      lpad(col("doc_id").cast("string"), 12, "0").as("conv_id"),
      col("text").as("doc_text"))

  private def sigsForDocs(s: SparkSession, dir: String): DataFrame =
    Dedup.signatures(s, docsAsCorpus(s, dir), docCfg)

  /** Verified LSH dup pairs over documents, with numeric ids restored. */
  private def docDupPairs(s: SparkSession, dir: String): DataFrame = {
    val sigs = sigsForDocs(s, dir)
    Dedup.verify(Dedup.candidates(sigs, docCfg), sigs, docCfg)
      .select(
        col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"),
        col("jaccard"))
  }

  /** Flagship: full transcripts near-dup pipeline (assembly → shingle →
    * MinHash → bands → salted pairs → exact verify → connected components)
    * on a deterministic synthesized corpus. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Dedup.pipeline(spark, TranscriptGen.df(spark, 300L), DedupConfig())

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship transcripts pipeline (kernels not SQL-expressible) ----
    "q_transcript_clusters" -> ((s, _) =>
      Dedup.pipeline(s, TranscriptGen.df(s, 600L), DedupConfig())
        .select(col("conv_id"), col("cluster_id"), col("is_canonical").cast("long").as("is_canonical"))),

    // ---- S-path: assembly (window-ordered concat; oracle: string_agg) ----
    "q_assembly" -> ((s, dir) =>
      eventsDf(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))).as("evs"),
          count(lit(1)).cast("long").as("n_events"))
        .select(
          col("user_id"),
          concat_ws(" ", col("evs.event_type")).as("doc"),
          col("n_events"))),

    // ---- exact dedup: md5 hash-groupBy with planted self-union dups ----
    "q_exact_dedup" -> ((s, dir) => {
      val d = documentsDf(s, dir).select(col("doc_id"), col("text"))
      val u = d.unionByName(d.select((col("doc_id") + 500000L).as("doc_id"), col("text")))
      u.groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(count(lit(1)).cast("long").as("group_size"), min(col("doc_id")).as("canonical_id"))
    }),

    // ---- token counting ----
    "q_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(documentsDf(s, dir))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_alpha_tokens").cast("long").as("n_alpha_tokens"),
          col("n_chars").cast("long").as("n_chars"))),

    // ---- shingling (S3 sorted-set invariant; counts vs string oracle) ----
    "q_shingle_stats" -> ((s, dir) =>
      sigsForDocs(s, dir).select(
        col("conv_id").cast("long").as("doc_id"),
        col("n_shingles").cast("long").as("n_shingles"))),

    // ---- exact Jaccard over word sets (E1/E2 verifier; array ops) ----
    "q_word_jaccard" -> ((s, dir) => {
      val w = documentsDf(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), array_distinct(split(lower(col("text")), " ")).as("toks"))
      val a = w.select(col("doc_id").as("id_a"), col("toks").as("t_a"))
      val b = w.select(col("doc_id").as("id_b"), col("toks").as("t_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("t_a"), col("t_b"))).cast("long").as("isec"),
          size(array_union(col("t_a"), col("t_b"))).cast("long").as("un"))
    }),

    // ---- exact Jaccard over 3-gram shingle sets (the dup-pair verifier) ----
    "q_ngram_jaccard" -> ((s, dir) => {
      val sigs = sigsForDocs(s, dir)
        .select(col("conv_id").cast("long").as("doc_id"), col("shingles"), col("n_shingles"))
        .filter(col("doc_id") < 150)
      val jac = udf { (x: Array[Long], y: Array[Long]) => graft.kernels.ExactSim.sortedIntersectionCount(x, y) }
      val a = sigs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"), col("n_shingles").as("n_a"))
      val b = sigs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"), col("n_shingles").as("n_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("isec", jac(col("sh_a"), col("sh_b")).cast("long"))
        .select(col("id_a"), col("id_b"), col("isec"),
          (col("n_a").cast("long") + col("n_b") - col("isec")).as("un"))
    }),

    // ---- the LSH dedup read path end-to-end (C1..C5) vs exact oracle ----
    "q_lsh_dup_pairs" -> ((s, dir) => docDupPairs(s, dir)),

    // ---- clustering (connected components) vs recursive-CTE oracle ----
    "q_doc_clusters" -> ((s, dir) => {
      val all = documentsDf(s, dir)
        .select(lpad(col("doc_id").cast("string"), 12, "0").as("conv_id"))
      val pairs = docDupPairs(s, dir).select(
        lpad(col("id_a").cast("string"), 12, "0").as("id_a"),
        lpad(col("id_b").cast("string"), 12, "0").as("id_b"))
      ConnectedComponents.assign(all, pairs)
        .select(col("conv_id").cast("long").as("doc_id"), col("cluster_id").cast("long").as("cluster_id"))
    }),

    // ---- exact knn (C7 brute force + C3/C4 top-k semantics) ----
    "q_knn_cosine" -> ((s, dir) => {
      val emb = embeddingsDf(s, dir)
      Knn.exactTopK(emb.filter(col("vec_id") < 20), emb, 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
    }),

    // ---- exact dense similarities (E4-E7) on embedding pairs ----
    "q_pair_metrics" -> ((s, dir) => {
      val e = embeddingsDf(s, dir).filter(col("vec_id") < 40)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Knn.dotCol("emb_a", "emb_b"), 6).as("dot"),
          round(Knn.cosineCol("emb_a", "emb_b"), 6).as("cosine"),
          round(Knn.l2DistCol("emb_a", "emb_b"), 6).as("l2_dist"),
          round(Knn.l1DistCol("emb_a", "emb_b"), 6).as("l1_dist"))
    }),

    // ---- language ID heuristic ----
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(documentsDf(s, dir))
        .select(col("doc_id"), col("n_en").cast("long").as("n_en"), col("n_de").cast("long").as("n_de"),
          col("n_fr").cast("long").as("n_fr"), col("n_es").cast("long").as("n_es"), col("predicted_lang"))),

    // ---- quality scoring ----
    "q_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(documentsDf(s, dir))
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_distinct_tokens").cast("long").as("n_distinct_tokens"),
          col("n_stopwords").cast("long").as("n_stopwords"),
          col("n_punct").cast("long").as("n_punct"),
          col("is_quality").cast("long").as("is_quality"))),

    // ---- rows-only (hash kernels / non-SQL-expressible) ----
    "q_minhash_signature" -> ((s, dir) =>
      sigsForDocs(s, dir).select(
        col("conv_id").cast("long").as("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))),

    "q_simhash" -> ((s, dir) =>
      sigsForDocs(s, dir).select(col("conv_id").cast("long").as("doc_id"), col("simhash"))),

    "q_simhash_dup_pairs" -> ((s, dir) => {
      // SimHash path: band fingerprints → bucket join → exact Hamming verify (E3 analog)
      val sigs = sigsForDocs(s, dir).select(col("conv_id").cast("long").as("doc_id"), col("simhash"))
      val bandUdf = udf { (fp: Long) => graft.kernels.SimHashModel.bands(fp, docCfg.simHashBands) }
      val banded = sigs.select(col("doc_id"), col("simhash"), explode(bandUdf(col("simhash"))).as("band"))
      val pairs = banded.select(col("band"), col("doc_id").as("id_a"), col("simhash").as("fp_a"))
        .join(banded.select(col("band"), col("doc_id").as("id_b"), col("simhash").as("fp_b")), Seq("band"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(first(col("fp_a")).as("fp_a"), first(col("fp_b")).as("fp_b"))
      val hammingSim = udf { (a: Long, b: Long) => graft.kernels.ExactSim.hammingSim64(a, b) }
      pairs.withColumn("simhash_sim", hammingSim(col("fp_a"), col("fp_b")))
        .filter(col("simhash_sim") >= 0.9)
        .select("id_a", "id_b", "simhash_sim")
    }),

    "q_candidate_pairs" -> ((s, dir) =>
      Dedup.candidates(sigsForDocs(s, dir), docCfg)
        .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"),
          col("matching_bands").cast("long").as("matching_bands"))),

    "q_topk_band_matches" -> ((s, dir) => {
      // C3/C4 analog: per query doc, top-3 candidates by matching bands,
      // deterministic id-order tiebreak (≙ ArrayHitCounter doc-id order)
      val cands = Dedup.candidates(sigsForDocs(s, dir), docCfg)
      val sym = cands.select(col("id_a").as("q"), col("id_b").as("c"), col("matching_bands"))
        .unionByName(cands.select(col("id_b").as("q"), col("id_a").as("c"), col("matching_bands")))
      val w = Window.partitionBy(col("q")).orderBy(desc("matching_bands"), asc("c"))
      sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q").cast("long").as("q_id"), col("rank").cast("long").as("rank"),
          col("c").cast("long").as("n_id"), col("matching_bands").cast("long").as("matching_bands"))
    }),

    "q_lcs_pass" -> ((s, dir) => {
      val sigs = sigsForDocs(s, dir)
      val verified = Dedup.verify(Dedup.candidates(sigs, docCfg), sigs, docCfg)
      VerifyPairs.lcsPass(verified, docsAsCorpus(s, dir))
        .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"),
          col("jaccard"), round(col("lcs_ratio"), 6).as("lcs_ratio"))
    }),

    "q_knn_lsh" -> ((s, dir) => {
      val emb = embeddingsDf(s, dir)
      Knn.lshTopK(s, emb.filter(col("vec_id") < 20), emb, 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
    }),

    "q_ivf_ann" -> ((s, dir) => {
      val emb = embeddingsDf(s, dir)
      Knn.ivfTopK(emb.filter(col("vec_id") < 20), emb, 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
    }),

    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(documentsDf(s, dir))),

    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(s, Multimodal.syntheticMedia(documentsDf(s, dir)))),

    "q_bucket_metrics" -> ((s, dir) =>
      CandidatePairs.bucketMetrics(sigsForDocs(s, dir))
        .select(col("bucket_size").cast("long").as("bucket_size"), col("n_buckets").cast("long").as("n_buckets"))),

    // ---- Hamming LSH by bit sampling (H2) + exact Hamming verify (E3) ----
    "q_hamming_lsh_pairs" -> ((s, dir) => {
      import s.implicits._
      // universe sized to ~50% fill for these docs: Hamming similarity over
      // a much larger sparse universe is trivially high (both-absent
      // positions agree), which is exactly why the reference pairs sparse
      // sets with Jaccard — the Hamming path needs dense-ish vectors
      val dims = 256
      // shingle-hash set folded onto a fixed 0..dims universe: the
      // ≙Vec.SparseBool form the reference's HammingLshModel consumes
      val sets = sigsForDocs(s, dir)
        .select(col("conv_id").cast("long").as("doc_id"), col("shingles"))
        .as[(Long, Array[Long])]
        .map { case (id, sh) =>
          val idx = sh.map(h => (((h % dims) + dims) % dims).toInt).distinct.sorted
          (id, idx)
        }
        .toDF("doc_id", "true_indices")
        // density floor: below ~25% fill the universe is mostly 0 for both
        // docs and Hamming similarity is trivially high regardless of
        // content — the Hamming path is for dense-ish vectors only
        .filter(size(col("true_indices")) >= 64)
      val banded = sets.as[(Long, Array[Int])].mapPartitions { iter =>
        val model = new graft.kernels.BitSamplingModel(dims, numTables = 32, rowsPerBand = 8)
        iter.flatMap { case (id, idx) => model.hash(idx).map(b => (id, b)) }
      }.toDF("doc_id", "band")
      val cands = banded.select(col("band"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("doc_id").as("id_b")), Seq("band"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).cast("long").as("matching_bands"))
        .filter(col("matching_bands") >= 8)
      val hammingSim = udf { (a: Array[Int], b: Array[Int]) =>
        graft.kernels.ExactSim.hamming(a.map(_.toLong), b.map(_.toLong), dims.toLong)
      }
      cands.hint("shuffle_hash")
        .join(sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed("true_indices", "t_a"), Seq("id_a"))
        .hint("shuffle_hash")
        .join(sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed("true_indices", "t_b"), Seq("id_b"))
        .withColumn("hamming_sim", hammingSim(col("t_a"), col("t_b")))
        .filter(col("hamming_sim") >= 0.85)
        .select("id_a", "id_b", "matching_bands", "hamming_sim")
    }),

    // ---- L2 LSH (stable distributions, H4) knn with exact re-score ----
    "q_knn_l2_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = embeddingsDf(s, dir)
      val dims = emb.select(size(col("embedding"))).first().getInt(0)
      def banded(df: org.apache.spark.sql.DataFrame, idCol: String) =
        df.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
          .mapPartitions { iter =>
            val model = new graft.kernels.L2LshModel(dims, numTables = 24, rowsPerBand = 2, w = 4)
            iter.flatMap { case (id, e) => model.hash(e).map(b => (id, b)) }
          }.toDF(idCol, "band")
      val q = banded(emb.filter(col("vec_id") < 20), "q_id")
      val c = banded(emb, "n_id")
      val cands = q.join(c, Seq("band")).filter(col("q_id") =!= col("n_id"))
        .groupBy("q_id", "n_id").agg(count(lit(1)).as("matching_bands"))
      val l2sim = udf { (a: Array[Float], b: Array[Float]) => graft.kernels.ExactSim.l2Sim(a, b) }
      val qv = emb.select(col("vec_id").cast("long").as("q_id"), col("embedding").as("q_emb"))
      val cv = emb.select(col("vec_id").cast("long").as("n_id"), col("embedding").as("n_emb"))
      val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("n_id"))
      cands.join(broadcast(qv), Seq("q_id")).join(cv, Seq("n_id"))
        .withColumn("sim", round(l2sim(col("q_emb"), col("n_emb")), 6))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
    }),

    // ---- Permutation LSH (H5) with freq-aware hit counting (C2,
    //      ≙ MatchHashesAndScoreQuery.java:74-81 min(queryFreq, docFreq)) ----
    "q_permutation_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = embeddingsDf(s, dir)
      def terms(df: org.apache.spark.sql.DataFrame, idCol: String, freqCol: String) =
        df.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
          .mapPartitions { iter =>
            val model = new graft.kernels.PermutationLshModel(16, repeating = true)
            iter.flatMap { case (id, e) => model.hash(e).map { case (t, f) => (id, t, f) } }
          }.toDF(idCol, "term", freqCol)
      val q = terms(emb.filter(col("vec_id") < 20), "q_id", "q_freq")
      val c = terms(emb, "n_id", "n_freq")
      val w = Window.partitionBy(col("q_id")).orderBy(desc("score"), asc("n_id"))
      q.join(c, Seq("term")).filter(col("q_id") =!= col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(sum(least(col("q_freq"), col("n_freq"))).cast("long").as("score"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("score"))
    })
  )

  /** DuckDB oracle SQL — same parquet tables, same column names/types. */
  def oracleSql: Map[String, String] = {
    val shingleCte =
      """sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
        |    i -> string_split(lower(text),' ')[i] || ' ' || string_split(lower(text),' ')[i+1] || ' ' || string_split(lower(text),' ')[i+2]
        |  )) AS s FROM documents)""".stripMargin

    val dupPairsCte =
      s"""WITH $shingleCte,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS isec,
         |         CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS un
         |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)""".stripMargin

    Map(
      "q_assembly" ->
        """SELECT user_id, string_agg(event_type, ' ' ORDER BY ts, event_id) AS doc,
          |CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY user_id""".stripMargin,

      "q_exact_dedup" ->
        """WITH u AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL SELECT doc_id + 500000, text FROM documents)
          |SELECT md5(text) AS content_hash, CAST(count(*) AS BIGINT) AS group_size,
          |       min(doc_id) AS canonical_id FROM u GROUP BY 1""".stripMargin,

      "q_token_count" ->
        """SELECT doc_id,
          |CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_tokens,
          |CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
          |CAST(length(text) AS BIGINT) AS n_chars FROM documents""".stripMargin,

      "q_shingle_stats" ->
        s"WITH $shingleCte SELECT doc_id, CAST(len(s) AS BIGINT) AS n_shingles FROM sh",

      "q_word_jaccard" ->
        """WITH w AS (SELECT doc_id, list_distinct(string_split(lower(text),' ')) AS t
          |  FROM documents WHERE doc_id < 150)
          |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |  CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS isec,
          |  CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS BIGINT) AS un
          |FROM w a, w b WHERE a.doc_id < b.doc_id""".stripMargin,

      "q_ngram_jaccard" ->
        s"""$dupPairsCte
           |SELECT id_a, id_b, isec, un FROM p WHERE id_a < 150 AND id_b < 150""".stripMargin,

      "q_lsh_dup_pairs" ->
        s"""$dupPairsCte
           |SELECT id_a, id_b,
           |  CASE WHEN un = 0 THEN 1.0 ELSE isec * 1.0 / un END AS jaccard
           |FROM p WHERE (isec = 0 AND un = 0) OR (un > 0 AND isec * 1.0 / un >= 0.8)""".stripMargin,

      "q_doc_clusters" ->
        s"""${dupPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
           |e AS (SELECT id_a, id_b FROM p WHERE (isec = 0 AND un = 0) OR (un > 0 AND isec * 1.0 / un >= 0.8)),
           |sym AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
           |reach AS (
           |  SELECT a, b FROM sym
           |  UNION
           |  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a)
           |SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
           |FROM documents d LEFT JOIN (
           |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a) c
           |USING (doc_id)""".stripMargin,

      "q_knn_cosine" ->
        """WITH z AS (
          |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
          |         unnest(list_zip(q.embedding, c.embedding)) AS pr
          |  FROM embeddings q, embeddings c
          |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
          |s AS (
          |  SELECT q_id, n_id,
          |    SUM(pr[1]::DOUBLE * pr[2]::DOUBLE)
          |      / sqrt(SUM(pr[1]::DOUBLE * pr[1]::DOUBLE)
          |             * SUM(pr[2]::DOUBLE * pr[2]::DOUBLE)) AS sim
          |  FROM z GROUP BY 1, 2),
          |r AS (SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank,
          |             n_id, round(sim, 6) AS sim FROM s)
          |SELECT q_id, rank, n_id, sim FROM r WHERE rank <= 5""".stripMargin,

      "q_pair_metrics" ->
        """WITH z AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |         unnest(list_zip(a.embedding, b.embedding)) AS pr
          |  FROM embeddings a, embeddings b
          |  WHERE a.vec_id < b.vec_id AND a.vec_id < 40 AND b.vec_id < 40)
          |SELECT id_a, id_b,
          |  round(SUM(pr[1]::DOUBLE * pr[2]::DOUBLE), 6) AS dot,
          |  round(SUM(pr[1]::DOUBLE * pr[2]::DOUBLE)
          |    / sqrt(SUM(pr[1]::DOUBLE * pr[1]::DOUBLE)
          |           * SUM(pr[2]::DOUBLE * pr[2]::DOUBLE)), 6) AS cosine,
          |  round(sqrt(SUM((pr[1]::DOUBLE - pr[2]::DOUBLE)
          |               * (pr[1]::DOUBLE - pr[2]::DOUBLE))), 6) AS l2_dist,
          |  round(SUM(abs(pr[1]::DOUBLE - pr[2]::DOUBLE)), 6) AS l1_dist
          |FROM z GROUP BY 1, 2""".stripMargin,

      "q_lang_id" ->
        """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
          |c AS (SELECT doc_id,
          |  CAST(len(list_filter(toks, x -> x IN ('the','and','of','is'))) AS BIGINT) AS n_en,
          |  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und'))) AS BIGINT) AS n_de,
          |  CAST(len(list_filter(toks, x -> x IN ('le','la','les','et'))) AS BIGINT) AS n_fr,
          |  CAST(len(list_filter(toks, x -> x IN ('el','los','las','y'))) AS BIGINT) AS n_es
          |FROM t)
          |SELECT doc_id, n_en, n_de, n_fr, n_es,
          |  CASE WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'und'
          |       WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
          |       WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
          |       WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
          |       ELSE 'es' END AS predicted_lang
          |FROM c""".stripMargin,

      "q_quality" ->
        """WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
          |SELECT doc_id,
          |  CAST(length(text) AS BIGINT) AS n_chars,
          |  CAST(len(toks) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
          |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stopwords,
          |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
          |  CAST(CASE WHEN len(toks) >= 5 AND len(list_distinct(toks)) * 3 >= len(toks)
          |            AND length(text) >= 20 THEN 1 ELSE 0 END AS BIGINT) AS is_quality
          |FROM t""".stripMargin
    )
  }
}
