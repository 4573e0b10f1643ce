package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Window-ordered turn assembly: transcripts → one document per conversation.
  *
  * The reference's unit of indexing is a whole ES document
  * (`VectorMapper.scala:125-131` parses one doc at a time); our unit is a
  * whole conversation, assembled from its turns under the total order
  * `(conv_id, turn_idx)` (the input contract's per-row invariant).
  *
  * Spark-first shape: a single hash aggregation —
  * `groupBy(conv_id).agg(sort_array(collect_list(struct(turn_idx, ...))))` —
  * rather than a window + dropDuplicates (one shuffle, map-side partial
  * aggregation, no second pass). Sorting happens *within* each group's
  * collected array (small: one conversation), never globally.
  */
object Assembly {

  /** @return (conv_id, doc_text, n_turns, n_chars, first_ts, last_ts)
    *         with doc_text = turn texts joined by a single separator in
    *         turn_idx order. Role/tool are deliberately not part of the
    *         document text under the default normalization config (duplicate
    *         text under different roles must still merge — FIXTURES.md §1).
    */
  def assemble(transcripts: DataFrame): DataFrame = {
    transcripts
      .groupBy(col("conv_id"))
      .agg(
        sort_array(collect_list(struct(col("turn_idx"), col("text")))).as("turns"),
        count(lit(1)).cast("int").as("n_turns"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts")
      )
      .withColumn("doc_text", concat_ws("\n", col("turns.text")))
      .withColumn("n_chars", length(col("doc_text")))
      .drop("turns")
      .select("conv_id", "doc_text", "n_turns", "n_chars", "first_ts", "last_ts")
  }

  /** Assembly variant that prefixes each turn with its role (for configs
    * where role changes must break duplicate equivalence).
    */
  def assembleWithRoles(transcripts: DataFrame): DataFrame = {
    transcripts
      .groupBy(col("conv_id"))
      .agg(
        sort_array(collect_list(struct(col("turn_idx"), concat_ws(": ", col("role"), col("text")).as("text"))))
          .as("turns"),
        count(lit(1)).cast("int").as("n_turns"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts")
      )
      .withColumn("doc_text", concat_ws("\n", col("turns.text")))
      .withColumn("n_chars", length(col("doc_text")))
      .drop("turns")
      .select("conv_id", "doc_text", "n_turns", "n_chars", "first_ts", "last_ts")
  }
}
