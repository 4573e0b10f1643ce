package graft.tools

import graft.kernels._
import org.apache.spark.sql.SparkSession

/** Recall matrix over the sf0.001 fixtures — driver-side kernel math
  * (≙ the reference's single-node RecallSuite computation,
  * `/root/reference/elastiknn-plugin-integration-tests/src/test/scala/com/klibisz/elastiknn/RecallSuite.scala:41-145`):
  * for each (model, config), candidate recall@10 vs the exact top-10 (ANN
  * paths) or banded-pair recall vs the exact pair truth (dedup paths).
  * `RecallMatrixSpec` pins every row within ±0.02; [[RecallScout]] prints
  * the matrix for re-pinning after a deliberate model change.
  */
object RecallMatrix {

  def recallAtK(exact: Map[Long, Seq[Long]], approx: Map[Long, Set[Long]], k: Int): Double = {
    val per = exact.toSeq.map { case (q, top) => top.take(k).count(n => approx.getOrElse(q, Set.empty).contains(n)).toDouble / k }
    per.sum / per.size
  }

  /** @return (row label, measured recall) for every pinned config. */
  def compute(spark: SparkSession, fixtureDir: String = "/root/testdata/sf0.001"): Seq[(String, Double)] = {
    val emb = spark.read.parquet(s"$fixtureDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val docs = spark.read.parquet(s"$fixtureDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val queries = emb.take(50)
    def exactTop(sim: (Array[Float], Array[Float]) => Double): Map[Long, Seq[Long]] =
      queries.map { case (q, qv) =>
        q -> emb.filter(_._1 != q).map { case (n, nv) => (n, sim(qv, nv)) }
          .sortBy { case (n, s) => (-s, n) }.take(10).map(_._1).toSeq
      }.toMap
    val exactCos = exactTop(ExactSim.cosine)
    val exactL2 = exactTop(ExactSim.l2Sim)

    def bucketCands(hash: Array[Float] => Array[Long], qhash: Array[Float] => Array[Long]): Map[Long, Set[Long]] = {
      val corpus = emb.flatMap { case (id, v) => hash(v).map(b => (b, id)) }.groupBy(_._1)
      queries.map { case (q, qv) =>
        q -> qhash(qv).flatMap(b => corpus.getOrElse(b, Array.empty).map(_._2)).toSet.filter(_ != q)
      }.toMap
    }

    for ((l, k) <- Seq((64, 4), (32, 8), (16, 8))) {
      val m = new CosineLshModel(64, l, k, 0L)
      out += (s"cosine L=$l k=$k" -> recallAtK(exactCos, bucketCands(m.hash, m.hash), 10))
    }
    for ((l, k, w) <- Seq((24, 2, 4), (12, 2, 4), (8, 4, 8))) {
      val m = new L2LshModel(64, l, k, w, 0L)
      out += (s"l2 L=$l k=$k w=$w" -> recallAtK(exactL2, bucketCands(m.hash, m.hash), 10))
    }
    for ((l, k, w, pr) <- Seq((12, 2, 4, 6), (8, 4, 8, 12))) {
      val m = new L2LshModel(64, l, k, w, 0L)
      out += (s"l2-multiprobe L=$l k=$k w=$w p=$pr" -> recallAtK(exactL2, bucketCands(m.hash, v => m.hashWithProbes(v, pr)), 10))
    }
    for ((k, rep) <- Seq((16, true), (8, false))) {
      val m = new PermutationLshModel(k, rep)
      def terms(v: Array[Float]): Array[Long] = m.hash(v).map { case (t, _) => t.toLong }
      out += (s"permutation k=$k rep=$rep" -> recallAtK(exactCos, bucketCands(terms, terms), 10))
    }

    // Hamming over doc shingle sets folded to a 256 universe
    val sets = docs.map { case (id, t) =>
      (id, Shingler.shingles(t, 3, Shingler.Words, 0L).map(h => (((h % 256) + 256) % 256).toInt).distinct.sorted)
    }
    val exactHam = sets.take(50).map { case (q, qs) =>
      q -> sets.filter(_._1 != q).map { case (n, ns) =>
        (n, ExactSim.hamming(qs.map(_.toLong), ns.map(_.toLong), 256L))
      }.sortBy { case (n, s) => (-s, n) }.take(10).map(_._1).toSeq
    }.toMap
    for ((l, k) <- Seq((32, 8), (16, 16))) {
      val m = new BitSamplingModel(256, l, k, 0L)
      val corpus = sets.flatMap { case (id, s) => m.hash(s).map(b => (b, id)) }.groupBy(_._1)
      val cands = sets.take(50).map { case (q, qs) =>
        q -> m.hash(qs).flatMap(b => corpus.getOrElse(b, Array.empty).map(_._2)).toSet.filter(_ != q)
      }.toMap
      out += (s"bitsampling L=$l k=$k" -> recallAtK(exactHam, cands, 10))
    }

    // MinHash dedup: recall of exact-Jaccard≥0.8 pairs via banding
    def pairRecall(found: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else truth.count(found.contains).toDouble / truth.size
    def allPairs(ids: Seq[Long]): Seq[(Long, Long)] = {
      val v = ids.distinct.sorted
      for (i <- v.indices; j <- (i + 1) until v.length) yield (v(i), v(j))
    }
    val shs = docs.map { case (id, t) => (id, Shingler.shingles(t, 3, Shingler.Words, 0L)) }
    val truth = (for {
      i <- shs.indices; j <- (i + 1) until shs.length
      if ExactSim.jaccard(shs(i)._2, shs(j)._2) >= 0.8
    } yield (shs(i)._1, shs(j)._1)).toSet
    for ((l, k) <- Seq((64, 2), (48, 3))) {
      val m = new MinHashModel(l, k, 0L)
      val found = shs.flatMap { case (id, s) => m.bandHashes(s).map(b => (b, id)) }
        .groupBy(_._1).values.flatMap(g => allPairs(g.map(_._2).toSeq)).toSet
      out += (s"minhash L=$l k=$k" -> pairRecall(found, truth))
    }

    // SimHash: fingerprint-sim≥0.9 pairs found via 8-band bucketing
    val fps = shs.map { case (id, s) => (id, SimHashModel.fingerprint(s, 0L)) }
    val simTruth = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      if ExactSim.hammingSim64(fps(i)._2, fps(j)._2) >= 0.9
    } yield (fps(i)._1, fps(j)._1)).toSet
    val simFound = fps.flatMap { case (id, fp) => SimHashModel.bands(fp, 8).map(b => (b, id)) }
      .groupBy(_._1).values.flatMap(g => allPairs(g.map(_._2).toSeq)).toSet
    out += ("simhash bands=8" -> pairRecall(simFound, simTruth))
    out.toSeq
  }
}

/** Prints the matrix (for re-pinning RecallMatrixSpec after deliberate
  * model changes).
  */
object RecallScout {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    RecallMatrix.compute(spark).foreach { case (n, r) => println(f"$n%-40s $r%.3f") }
    spark.stop()
  }
}
