package graft

import graft.kernels.{Hashing, MinHashModel}

/** DuckDB-SQL fragment generator that reproduces the engine's 64-bit hash
  * kernels ([[graft.kernels.Hashing]], [[graft.kernels.MinHashModel]],
  * [[graft.kernels.SimHashModel]], [[graft.kernels.Shingler]]) in portable
  * ANSI-ish SQL, so the driver's DuckDB oracle can independently recompute
  * LSH signatures from the same parquet tables.
  *
  * Technique notes:
  *   - 64-bit wrap-around multiply is built from 32-bit halves in HUGEINT
  *     (DuckDB raises on UBIGINT overflow rather than wrapping);
  *   - `let`-binding via `list_transform([expr], v -> body)[1]` keeps the
  *     generated expression trees linear in size (no exponential blow-up
  *     from repeated sub-expressions);
  *   - the hot per-(shingle × hash-function) MinHash minima are expressed
  *     *relationally* (unnest + cross join a VALUES param table + GROUP BY
  *     min) rather than through list lambdas — DuckDB vectorizes that shape
  *     orders of magnitude better (measured 0.4 s/doc → 3 ms/doc);
  *   - model parameters (the `java.util.Random(seed)` draws) are baked into
  *     the SQL as literals, mirroring the reference's derive-from-seed
  *     philosophy (`ModelCache.scala:17-21`): the oracle depends only on
  *     (seed, L, k), never on engine state.
  */
object DuckSql {

  private val U64H = "CAST(18446744073709551616 AS HUGEINT)"
  private val Gold = 0x9e3779b97f4a7c15L

  private var n = 0
  private def let(expr: String)(f: String => String): String = {
    n += 1
    val v = s"v$n"
    s"list_transform([$expr], $v -> ${f(v)})[1]"
  }

  private def unsignedStr(x: Long): String = java.lang.Long.toUnsignedString(x)

  /** (a * bconst) mod 2^64; `a` must be a short UBIGINT expr (appears 3x). */
  private def mul64c(a: String, bconst: Long): String = {
    val bl = unsignedStr(bconst & 0xffffffffL)
    val bh = unsignedStr(bconst >>> 32)
    s"CAST((CAST((($a)%4294967296)*$bl::UBIGINT AS HUGEINT)" +
      s" + CAST((((($a)>>32)*$bl::UBIGINT)%4294967296 + ((($a)%4294967296)*$bh::UBIGINT)%4294967296)%4294967296 AS HUGEINT)*4294967296)" +
      s" % $U64H AS UBIGINT)"
  }

  /** splitmix64 finalizer ≙ [[Hashing.mix64(z0:Long)*]]; z a short UBIGINT expr. */
  private def mix64(z: String): String =
    let(s"xor(($z), ($z)>>30)") { a1 =>
      let(mul64c(a1, 0xbf58476d1ce4e5b9L)) { m1 =>
        let(s"xor($m1, $m1>>27)") { a2 =>
          let(mul64c(a2, 0x94d049bb133111ebL)) { m2 =>
            s"xor($m2, $m2>>31)"
          }
        }
      }
    }

  private def addu(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT)+CAST($b AS HUGEINT)) % $U64H AS UBIGINT)"

  /** mix64(a, b) = mix64(a*GOLD + b) with a, b short UBIGINT exprs. */
  def mixPair(a: String, b: String): String =
    let(addu(mul64c(a, Gold), b))(mix64)

  /** Lambda body for `(h, x) -> mix64(h*GOLD + x)` chains. */
  private def mixBody: String = mixPair("h", "x")

  /** UBIGINT expr → signed BIGINT (two's complement). */
  def ts(u: String): String =
    let(u)(v => s"CAST(CAST($v AS HUGEINT) - CASE WHEN $v >= 9223372036854775808::UBIGINT THEN $U64H ELSE 0::HUGEINT END AS BIGINT)")

  /** signed BIGINT expr → UBIGINT (two's complement). */
  def su(s0: String): String =
    let(s0)(v => s"CAST(CAST($v AS HUGEINT) + CASE WHEN $v < 0 THEN $U64H ELSE 0::HUGEINT END AS UBIGINT)")

  /** Java int32 wrap of a BIGINT-domain expr (used once; no let needed). */
  private def w32(v: String): String =
    s"(((($v + 2147483648) % 4294967296 + 4294967296) % 4294967296) - 2147483648)"

  /** ≙ [[Hashing.fold32]] on a signed BIGINT shingle value. */
  private def fold32(s0: String): String =
    s"((((xor($s0, ($s0) >> 32) & 4294967295) + 2147483648) % 4294967296) - 2147483648)"

  /** ≙ [[Hashing.hashString]](t, seed=0); `t` a short VARCHAR expr. */
  def hashStringExpr(t: String): String = {
    val h0 = unsignedStr(Hashing.mix64(0L ^ 0x51_7c_c1_b7_27_22_0a_95L))
    val reduced =
      s"list_reduce(list_prepend($h0::UBIGINT, " +
        s"list_transform(string_split($t,''), c -> CAST(unicode(c) AS UBIGINT))), " +
        s"(h,c) -> ${let("xor(h,c)")(mix64)})"
    let(reduced)(hh => let(s"xor($hh, CAST(length($t) AS UBIGINT))")(mix64))
  }

  /** The MinHash `(t, r, a, b)` parameter table as a VALUES clause, baked
    * from the same `java.util.Random(seed)` stream as [[MinHashModel]].
    */
  private def funcsValues(model: MinHashModel): String = {
    val k = model.rowsPerBand
    val rows = (0 until model.numTables * k)
      .map(i => s"(${i / k},${i % k},${model.paramsA(i)},${model.paramsB(i)})")
      .mkString(",")
    s"(VALUES $rows) funcs(t, r, fa, fb)"
  }

  private def binitValues(model: MinHashModel): String = {
    val rows = (0 until model.numTables)
      .map(t => s"($t,${unsignedStr(model.bandInit(t))}::UBIGINT)")
      .mkString(",")
    s"(VALUES $rows) binit(t, bi)"
  }

  private def emptyBandsList(model: MinHashModel): String =
    model.emptyBandHashes.map(x => s"${x}::BIGINT").mkString("[", ",", "]")

  /** CTE chain `toks → … → sigb` computing, per document of `table`,
    * exactly what [[graft.operators.Signatures.signatures]] computes:
    * sorted distinct shingle hashes `s`, `n_shingles`, the L MinHash band
    * hashes `bands`, the 64-bit `simhash`, and the order-canonical
    * `set_hash` — bit-for-bit equal to the Spark kernels (validated against
    * the engine's parquet dumps). Word-shingle mode with `cfg.shingleK`,
    * seed 0 only (what the driver queries use).
    */
  def sigCtes(cfg: DedupConfig, table: String, idCol: String = "doc_id", textCol: String = "text"): String = {
    require(cfg.seed == 0L && cfg.shingleMode == graft.kernels.Shingler.Words,
      "oracle generator supports the driver-query config family (seed 0, word shingles)")
    val model = new MinHashModel(cfg.numTables, cfg.rowsPerBand, cfg.seed)
    val shingleInit = unsignedStr(0x2545f4914f6cdd1dL ^ cfg.seed)
    val setInit = unsignedStr(0x243f6a8885a308d3L ^ cfg.seed)
    val k = cfg.shingleK
    val shingleWindow = (0 until k).map(m => s"th[j+$m]").mkString(", ")
    val minExpr = w32(s"(${w32(s"(${w32("(1+ti)")}*fa)")} + fb)") + s" % ${MinHashModel.HashPrime}"
    val shingleChain = ts(s"list_reduce([$shingleInit::UBIGINT, $shingleWindow], (h,x) -> $mixBody)")
    val setChain = ts(s"list_reduce(list_prepend($setInit::UBIGINT, list_transform(s, x -> ${su("x")})), (h,x) -> $mixBody)")
    s"""
toks AS (
  SELECT $idCol AS doc_id, list_filter(string_split(trim(regexp_replace(lower($textCol), '\\s+', ' ', 'g')), ' '), t -> len(t) > 0) AS tk
  FROM $table
),
tokh AS (
  SELECT doc_id, list_transform(tk, t -> ${hashStringExpr("t")}) AS th FROM toks
),
shl AS (
  SELECT doc_id, list_sort(list_distinct(CASE WHEN len(th) >= $k THEN list_transform(generate_series(1, len(th)-${k - 1}), j -> $shingleChain) ELSE [] END)) AS s
  FROM tokh
),
shrow AS (
  SELECT doc_id, ${fold32("u.x")} AS ti, ${let(su("u.x"))(mix64)} AS mixed
  FROM shl, unnest(s) AS u(x)
),
minima AS (
  SELECT doc_id, t, r, min($minExpr) AS mn
  FROM shrow, ${funcsValues(model)}
  GROUP BY doc_id, t, r
),
bandrow AS (
  SELECT m.doc_id, m.t, ${ts(s"list_reduce(list_prepend(any_value(binit.bi), list(${su("m.mn")} ORDER BY m.r)), (h,x) -> $mixBody)")} AS band_hash
  FROM minima m JOIN ${binitValues(model)} ON m.t = binit.t
  GROUP BY m.doc_id, m.t
),
simrow AS (
  SELECT doc_id, b, CASE WHEN 2*sum(CASE WHEN (mixed >> b) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE 0 END) > count(*) THEN CAST(1::UBIGINT << b AS HUGEINT) ELSE 0::HUGEINT END AS bit
  FROM shrow, unnest(range(0,64)) AS rb(b)
  GROUP BY doc_id, b
),
sim AS (
  SELECT doc_id, ${ts("CAST(sum(bit) AS UBIGINT)")} AS simhash FROM simrow GROUP BY doc_id
),
bandl AS (
  SELECT doc_id, list(band_hash ORDER BY t) AS bands FROM bandrow GROUP BY doc_id
),
sigb AS (
  SELECT s.doc_id, s.s, len(s.s) AS n_shingles,
         coalesce(b.bands, ${emptyBandsList(model)}) AS bands,
         coalesce(m.simhash, 0) AS simhash,
         $setChain AS set_hash
  FROM shl s LEFT JOIN bandl b USING (doc_id) LEFT JOIN sim m USING (doc_id)
)"""
  }

  /** Signed-BIGINT expr ≙ [[graft.operators.Knn.ivfTopK]]'s centroid-sample
    * order key `Hashing.mix64(IvfSampleSeed, vec_id)`: the oracle
    * re-derives the same pseudo-random corpus sample.
    */
  def ivfSampleHashExpr(idExpr: String): String =
    ts(mixPair(s"${unsignedStr(graft.operators.Knn.IvfSampleSeed)}::UBIGINT", su(idExpr)))

  /** VALUES table `(t, j, pos)`: bit `j` of Hamming-LSH table `t` samples
    * vector position `pos` — ≙ [[graft.kernels.BitSamplingModel]]'s
    * merge-walk emission order (bits appended in ascending position order).
    */
  def bitSamplingValues(dims: Int, numTables: Int, rowsPerBand: Int, seed: Long = 0L): String = {
    val model = new graft.kernels.BitSamplingModel(dims, numTables, rowsPerBand, seed)
    val tbl = model.tablePositions
    val rows = (for {
      t <- 0 until numTables
      (pos, j) <- tbl(t).zipWithIndex
    } yield s"($t,$j,$pos)").mkString(",")
    s"(VALUES $rows) sp(t, j, pos)"
  }
}
