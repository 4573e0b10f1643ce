package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-ordered turn assembly: transcripts → one document per conversation.
  *
  * The reference's unit of indexing is a whole ES document
  * (`VectorMapper.scala:125-131` parses one doc at a time); our unit is a
  * whole conversation, assembled from its turns under the total order
  * `(conv_id, turn_idx)` (the input contract's per-row invariant).
  *
  * Spark-first shape: ONE hash exchange on conv_id, a Tungsten
  * sort-within-partitions on (conv_id, turn_idx, text), then a streaming
  * `mapPartitions` pass that concatenates each contiguous conversation run.
  * The previous shape — `groupBy(conv_id).agg(sort_array(collect_list(
  * struct(turn_idx, text))))` — paid for the same exchange PLUS an
  * ObjectHashAggregate (object-form buffers, no codegen) and an interpreted
  * per-element struct comparator inside sort_array; it was the single most
  * expensive operator of the signatures phase (measured 15.7 s of a 25 s
  * phase at 8 cores / 300k convs). The sort pass replaces all of that with
  * binary-row machinery and a linear scan, and unlike the aggregate it
  * spills gracefully (no objectHashAggregate fallback threshold to tune).
  *
  * Ordering semantics are IDENTICAL to the sort_array shape: ascending
  * (turn_idx, text) with nulls first — Spark's struct ordering compares
  * fields in sequence with null < non-null, exactly the default
  * `sortWithinPartitions` order. Equivalence is pinned by AssemblySpec
  * against the old aggregate shape on adversarial inputs (duplicate
  * turn_idx, null text/ts, empty text, supplementary-plane chars).
  */
object Assembly {

  /** @return (conv_id, doc_text, n_turns, n_chars, first_ts, last_ts)
    *         with doc_text = turn texts joined by a single separator in
    *         turn_idx order. Role/tool are deliberately not part of the
    *         document text under the default normalization config (duplicate
    *         text under different roles must still merge — FIXTURES.md §1).
    */
  def assemble(transcripts: DataFrame): DataFrame =
    assembled(transcripts, col("text"), withTs = true)

  /** Assembly variant that prefixes each turn with its role (for configs
    * where role changes must break duplicate equivalence).
    */
  def assembleWithRoles(transcripts: DataFrame): DataFrame =
    assembled(transcripts, concat_ws(": ", col("role"), col("text")), withTs = true)

  /** The pipeline's document shape: (conv_id, doc_text, n_turns, n_chars)
    * WITHOUT the first_ts/last_ts columns. The signature stage consumes
    * only (conv_id, doc_text, n_turns), and reading `ts` costs a
    * per-turn-row external Timestamp materialization plus 8 shuffle
    * bytes/row that the full contract pays for nothing on the hot path
    * (guide §2.3: project before the exchange).
    */
  def assembleDocs(transcripts: DataFrame): DataFrame =
    assembled(transcripts, col("text"), withTs = false)

  /** Shared sort-then-scan kernel. `textExpr` is evaluated BEFORE the
    * exchange (so the roles variant sorts by the prefixed text, exactly as
    * sort_array over struct(turn_idx, prefixed_text) did).
    */
  private def assembled(transcripts: DataFrame, textExpr: Column, withTs: Boolean): DataFrame = {
    val convIdNullable = transcripts.schema("conv_id").nullable
    // same output schema (incl. nullability) as the aggregate shape:
    // concat_ws/count/length are non-null, min/max(ts) nullable
    val baseFields = Seq(
      StructField("conv_id", StringType, convIdNullable),
      StructField("doc_text", StringType, nullable = false),
      StructField("n_turns", IntegerType, nullable = false),
      StructField("n_chars", IntegerType, nullable = false))
    val outSchema = StructType(
      if (withTs) baseFields ++ Seq(
        StructField("first_ts", transcripts.schema("ts").dataType, nullable = true),
        StructField("last_ts", transcripts.schema("ts").dataType, nullable = true))
      else baseFields)
    val inCols = Seq(col("conv_id"), col("turn_idx"), textExpr.as("text")) ++
      (if (withTs) Seq(col("ts")) else Nil)
    transcripts
      .select(inCols: _*)
      .repartition(col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("text"))
      .mapPartitions { rows =>
        new Iterator[Row] {
          private var pending: Row = _          // first row of the next group
          private val sb = new java.lang.StringBuilder(4096)

          override def hasNext: Boolean = pending != null || rows.hasNext

          override def next(): Row = {
            var r = if (pending != null) pending else rows.next()
            pending = null
            val key = r.getString(0)
            sb.setLength(0)
            var firstElem = true
            var nTurns = 0
            // min/max over ts via the external objects' natural order —
            // identical to min(ts)/max(ts) (Timestamp/LocalDateTime/Date
            // compare by instant; nulls ignored like the aggregates)
            var firstTs: AnyRef = null
            var lastTs: AnyRef = null
            var done = false
            while (!done) {
              nTurns += 1
              // concat_ws semantics: null elements are skipped entirely
              // (no separator emitted for them)
              val t = if (r.isNullAt(2)) null else r.getString(2)
              if (t != null) {
                if (firstElem) firstElem = false else sb.append('\n')
                sb.append(t)
              }
              if (withTs && !r.isNullAt(3)) {
                val ts = r.get(3).asInstanceOf[AnyRef]
                if (firstTs == null || cmp(ts, firstTs) < 0) firstTs = ts
                if (lastTs == null || cmp(ts, lastTs) > 0) lastTs = ts
              }
              if (rows.hasNext) {
                val nxt = rows.next()
                if (java.util.Objects.equals(nxt.getString(0), key)) r = nxt
                else { pending = nxt; done = true }
              } else done = true
            }
            val doc = sb.toString
            // n_chars ≡ length(doc_text): Spark counts code points, not
            // UTF-16 units
            val nChars = doc.codePointCount(0, doc.length)
            if (withTs) Row(key, doc, nTurns, nChars, firstTs, lastTs)
            else Row(key, doc, nTurns, nChars)
          }

          private def cmp(a: AnyRef, b: AnyRef): Int =
            a.asInstanceOf[Comparable[AnyRef]].compareTo(b)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
