package graft.sources

import graft.kernels.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp
import java.util.Random

/** One row of the transcripts input contract (BASELINE.json `input_hint`):
  * `(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)`.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Deterministic synthetic transcripts generator with planted duplicate
  * structure (FIXTURES.md §1) — the analog of the reference's seed-0 corpus
  * generator (`/root/reference/elastiknn-plugin-integration-tests/.../TestData.scala:81-93`).
  *
  * Every conversation is a pure function of `(seed, convIdx)`, so the corpus
  * is identical across partitioning, parallelism level, and rerun — the
  * property the e2e determinism contract leans on.
  *
  * Planted structure, per block of 10 conversation indices (block b = idx/10):
  *   - positions 0..5: unique conversations (singleton clusters);
  *     position 4 is a single-turn conv when b%5==0; position 5 is an
  *     entirely-empty-text conv when b%7==0 (empty docs are mutual
  *     duplicates: `Jaccard(∅,∅)=1`, ≙ ExactModel.java:13)
  *   - position 6: original of a planted dup group
  *   - position 7: near-duplicate of 6 (≈1.5% token substitutions; one turn
  *     dropped when long) — Jaccard vs 6 ≈ 0.85–0.97
  *   - position 8: whitespace/case-noised copy of 6 (exact dup after
  *     normalization)
  *   - position 9: hard negative — shares a 2-turn boilerplate prefix with
  *     every other position-9 conv (the bucket-skew stressor, SURVEY §7.4)
  *     but has a unique body; Jaccard far below θ
  */
object TranscriptGen {

  val Roles: Array[String] = Array("user", "assistant", "tool")
  val Tools: Array[String] = Array("search", "calculator", "browser", "python")

  private def word(rng: Random): String = "w" + rng.nextInt(5000)

  private def sentence(rng: Random, nTokens: Int): String =
    (0 until nTokens).map(_ => word(rng)).mkString(" ")

  /** Hard-negative boilerplate families are bounded to this many position-9
    * conversations: noise candidate pairs then grow linearly with corpus
    * size (families × bounded²) instead of quadratically — the property a
    * 10^12-turn corpus needs. Within a family the shared prefix still
    * creates correlated LSH buckets (the skew stressor).
    */
  val BoilerplateFamilySize = 400L

  /** The boilerplate prefix turns shared by one hard-negative family. */
  private def boilerplate(seed: Long, family: Long): Array[String] = {
    val rng = new Random(Hashing.mix64(seed, -1L - family))
    Array(sentence(rng, 40), sentence(rng, 35))
  }

  /** Base (template) conversation for block b: list of (role, text, tool). */
  private def template(seed: Long, block: Long, salt: Long, minTurns: Int, maxTurns: Int): Array[(String, String, String)] = {
    val rng = new Random(Hashing.mix64(Hashing.mix64(seed, block), salt))
    val nTurns = minTurns + rng.nextInt(maxTurns - minTurns + 1)
    Array.tabulate(nTurns) { t =>
      val role = Roles(t % Roles.length)
      val tool = if (role == "tool") Tools(rng.nextInt(Tools.length)) else null
      (role, sentence(rng, 5 + rng.nextInt(56)), tool)
    }
  }

  /** ~1.5% token substitutions + drop the last turn when the conv is long. */
  private def nearDup(seed: Long, convIdx: Long, base: Array[(String, String, String)]): Array[(String, String, String)] = {
    val rng = new Random(Hashing.mix64(seed ^ 0x5bf03635L, convIdx))
    val kept = if (base.length >= 12) base.dropRight(1) else base
    kept.map { case (role, text, tool) =>
      val toks = text.split(' ').map(t => if (rng.nextDouble() < 0.015) word(rng) else t)
      (role, toks.mkString(" "), tool)
    }
  }

  /** Random case flips + whitespace padding; shingle set is unchanged after
    * normalization (tests the sort/normalize-on-write invariant, S3).
    */
  private def noisyCopy(seed: Long, convIdx: Long, base: Array[(String, String, String)]): Array[(String, String, String)] = {
    val rng = new Random(Hashing.mix64(seed ^ 0x77aa11L, convIdx))
    base.map { case (role, text, tool) =>
      val t2 = text.split(' ').map { t =>
        val t3 = if (rng.nextBoolean()) t.toUpperCase else t
        if (rng.nextDouble() < 0.1) t3 + "  " else t3
      }.mkString(" ")
      (role, if (rng.nextBoolean()) "  " + t2 else t2, tool)
    }
  }

  /** Turns for conversation `idx` — pure function of (seed, idx). */
  def turnsFor(seed: Long, idx: Long): Seq[Turn] = {
    val block = idx / 10
    val pos = (idx % 10).toInt
    val convId = f"conv-$idx%08d"
    val turns: Array[(String, String, String)] = pos match {
      case p if p <= 5 =>
        if (p == 5 && block % 7 == 0)
          template(seed, block, p.toLong, 3, 8).map { case (r, _, tl) => (r, "", tl) } // empty conv
        else if (p == 4 && block % 5 == 0)
          template(seed, block, p.toLong, 1, 1) // single-turn conv
        else template(seed, block, p.toLong, 3, 40)
      case 6 => template(seed, block, 6L, 6, 40)
      case 7 => nearDup(seed, idx, template(seed, block, 6L, 6, 40))
      case 8 => noisyCopy(seed, idx, template(seed, block, 6L, 6, 40))
      case 9 =>
        val bp = boilerplate(seed, block / BoilerplateFamilySize)
        val body = template(seed, block, 9L, 3, 6)
        bp.zipWithIndex.map { case (t, i) => (Roles(i % 3), t, null: String) } ++ body
    }
    val baseTs = 1700000000000L + idx * 3600000L
    turns.zipWithIndex.map { case ((role, text, tool), t) =>
      Turn(convId, t, role, text, tool, new Timestamp(baseTs + t * 60000L))
    }.toSeq
  }

  /** Distributed deterministic generation: `spark.range` partitions the conv
    * index space; each task generates its convs locally (no shuffle, no
    * driver-side data). Scales linearly with executors at any corpus size.
    */
  def transcripts(spark: SparkSession, nConvs: Long, seed: Long = 42L, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, nConvs, 1L, partitions) else spark.range(nConvs)
    base.flatMap(idx => turnsFor(seed, idx))
  }

  /** Ground-truth duplicate-cluster key for conv `idx` under the planted
    * structure — used only by tests (the e2e oracle recomputes truth from
    * exact Jaccard; this is the *a-priori* planted key).
    */
  def plantedClusterKey(idx: Long): String = {
    val block = idx / 10
    val pos = (idx % 10).toInt
    pos match {
      case 6 | 7 | 8                      => s"dup-$block"
      case 5 if block % 7 == 0            => "empty"
      case _                              => s"solo-$idx"
    }
  }

  def df(spark: SparkSession, nConvs: Long, seed: Long = 42L, partitions: Int = 0): DataFrame =
    transcripts(spark, nConvs, seed, partitions).toDF()
}
