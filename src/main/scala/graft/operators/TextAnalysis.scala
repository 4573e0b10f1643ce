package graft.operators

import graft.kernels.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline slice: language
  * ID, quality scoring, token counting, document fingerprinting, exact
  * dedup. All built from codegen'd `org.apache.spark.sql.functions._`
  * (no UDFs in the hot path) so filters/projections stay inside
  * whole-stage codegen and push down to the scan.
  */
object TextAnalysis {

  /** BPE-style pre-tokenizer pattern (the GPT-2 family's, minus the
    * `\s+(?!\S)` lookahead branch, which RE2 — the DuckDB oracle's engine —
    * does not support; for a token COUNT the lookahead split of trailing
    * whitespace is irrelevant). Alternation order matters and is identical
    * under Java regex and RE2 (both leftmost-first here): contractions,
    * then letter runs, digit runs, punctuation runs (each with an optional
    * leading space, as BPE vocabularies encode), then whitespace runs.
    * Whitespace is the EXPLICIT class [ \t\n\x0B\f\r], not `\s`: Java's
    * `\s` includes vertical tab where RE2's does not, and the same literal
    * class is the one spelling both engines read identically.
    */
  val BpePretokenPattern: String =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+|[ \t\n\x0B\f\r]+"""

  /** Whitespace-token, alphanumeric-token, and BPE-pretoken counts. */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z0-9]+"), lit(0))).as("n_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("n_alpha_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpePretokenPattern), lit(0))).as("n_bpe_tokens"),
      length(col(textCol)).as("n_chars")
    )

  private val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality-score features: lengths, token stats, stopword count, punct
    * count, plus a boolean gate — the length/punct/stopword-ratio heuristic
    * family used for training-data filtering.
    */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      size(filter(toks, t => t.isin(StopEn: _*))).as("n_stopwords"),
      size(regexp_extract_all(col(textCol), lit("[.,;:!?]"), lit(0))).as("n_punct")
    ).withColumn(
      "is_quality",
      (col("n_tokens") >= 5 && col("n_distinct_tokens") * 3 >= col("n_tokens") && col("n_chars") >= 20).cast("int")
    )
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y")
  )

  /** N-gram/stopword-profile language ID heuristic: count marker tokens per
    * language, predict the argmax (ties broken by the fixed language order).
    * Deterministic and SQL-expressible (mirrored in the DuckDB oracle).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val counted = LangMarkers.foldLeft(docs.select(col(idCol), toks.as("toks"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"n_$lang", size(filter(col("toks"), t => t.isin(markers: _*))))
    }
    val best = LangMarkers.map { case (l, _) => col(s"n_$l") }.reduce((a, b) => greatest(a, b))
    // first language (in fixed LangMarkers order) reaching the max count wins ties
    val pred = LangMarkers.foldRight(lit("und"): Column) { case ((lang, _), acc) =>
      when(col(s"n_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    counted.withColumn("predicted_lang", pred).drop("toks")
  }

  /** Exact deduplication: group by content hash (md5 of the raw text),
    * count group size, pick the canonical (min id) member — the
    * hash-groupBy dedup every training pipeline starts with.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(count(lit(1)).cast("int").as("group_size"), min(col(idCol)).as("canonical_id"))

  private val fingerprintUdf = udf { (text: String) =>
    Hashing.hashString(if (text == null) "" else text)
  }

  /** 64-bit rolling-hash document fingerprint (content-identity key usable
    * as a shuffle/bucketing column at 100 TB — exact-dup groups co-locate).
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), fingerprintUdf(col(textCol)).as("fingerprint"))
}
