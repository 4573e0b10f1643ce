package graft.kernels

import java.util.Random
import scala.collection.mutable

/** Hamming LSH by bit sampling — faithful re-implementation of
  * `/root/reference/elastiknn-models/src/main/java/com/klibisz/elastiknn/models/HammingLshModel.java:31-128`:
  *
  *   - `L*k` (vector-index, table-index) pairs; if `L*k <= dims` one global
  *     sample without replacement assigned round-robin (`i % L`), else an
  *     independent k-sample per table (`HammingLshModel.java:36-48`);
  *   - sampling without replacement via repeated `rng.nextInt(max)` with a
  *     seen-set, preserving draw order (`:84-93`);
  *   - hashing = merge-walk of the sorted true indices against the sorted
  *     sampled positions, appending a 1/0 bit to every table that sampled
  *     the position (`:95-127`); bits are packed LSB-first exactly like
  *     `BitBuffer.IntBuffer` (`storage/BitBuffer.java:22-31`).
  *
  * Table hashes are emitted as Longs: mix(tableIdx, packedBits) — the
  * information content of `writeIntsWithPrefix`-style byte terms.
  */
final class BitSamplingModel(val dims: Int, val numTables: Int, val rowsPerBand: Int, val seed: Long = 0L)
    extends Serializable {

  // Edge-config guards: bits are packed into an Int (wraps past 32, where
  // the reference's BitBuffer grows), and a table cannot sample more
  // positions than the universe has (the reference degrades gracefully;
  // we fail loudly at construction instead of corrupting hashes).
  require(rowsPerBand <= 32, s"rowsPerBand must be <= 32 (Int bit packing), got $rowsPerBand")
  require(rowsPerBand <= dims, s"rowsPerBand ($rowsPerBand) must be <= dims ($dims)")

  // sampledPositions: sorted by vector index; each holds table indices to update.
  private val (posIndex: Array[Int], posTables: Array[Array[Int]]) = {
    val rng = new Random(seed)
    val pairs = new Array[(Int, Int)](numTables * rowsPerBand) // (vecIndex, tableIndex)
    if (numTables * rowsPerBand <= dims) {
      val sample = BitSamplingModel.sampleNoReplacement(rng, numTables * rowsPerBand, dims)
      var i = 0
      while (i < pairs.length) { pairs(i) = (sample(i), i % numTables); i += 1 }
    } else {
      var t = 0
      while (t < numTables) {
        val sample = BitSamplingModel.sampleNoReplacement(rng, rowsPerBand, dims)
        var k = 0
        while (k < rowsPerBand) { pairs(t * rowsPerBand + k) = (sample(k), t); k += 1 }
        t += 1
      }
    }
    val grouped = pairs.groupBy(_._1).toArray.sortBy(_._1)
    (grouped.map(_._1), grouped.map(_._2.map(_._2)))
  }

  /** Per-table sampled positions in bit-emission order (ascending position
    * — the merge-walk in [[hash]] appends bits in sorted-position order).
    * Exposed for the DuckDB oracle generator ([[graft.DuckSql]]).
    */
  def tablePositions: Array[Array[Int]] = {
    val out = Array.fill(numTables)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var p = 0
    while (p < posIndex.length) {
      posTables(p).foreach(t => out(t) += posIndex(p))
      p += 1
    }
    out.map(_.toArray)
  }

  /** L table hashes for a sorted true-index set. */
  def hash(trueIndices: Array[Int]): Array[Long] = {
    val bits = new Array[Int](numTables)  // packed bits per table, LSB-first
    val lens = new Array[Int](numTables)  // bits appended so far per table
    @inline def put(table: Int, one: Boolean): Unit = {
      if (one) bits(table) |= (1 << lens(table))
      lens(table) += 1
    }
    var ixsp = 0
    var ixti = 0
    while (ixti < trueIndices.length && ixsp < posIndex.length) {
      val trueIndex = trueIndices(ixti)
      val vecIndex = posIndex(ixsp)
      if (vecIndex > trueIndex) ixti += 1
      else if (vecIndex < trueIndex) {
        val ts = posTables(ixsp); var j = 0
        while (j < ts.length) { put(ts(j), one = false); j += 1 }
        ixsp += 1
      } else {
        val ts = posTables(ixsp); var j = 0
        while (j < ts.length) { put(ts(j), one = true); j += 1 }
        ixsp += 1; ixti += 1
      }
    }
    while (ixsp < posIndex.length) {
      val ts = posTables(ixsp); var j = 0
      while (j < ts.length) { put(ts(j), one = false); j += 1 }
      ixsp += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) { out(t) = Hashing.mix64(t.toLong, bits(t).toLong & 0xffffffffL); t += 1 }
    out
  }
}

object BitSamplingModel {
  /** ≙ `HammingLshModel.sampleNoReplacement` (`HammingLshModel.java:84-93`) —
    * draw order preserved, duplicates skipped.
    */
  def sampleNoReplacement(rng: Random, n: Int, max: Int): Array[Int] = {
    val seen = new mutable.HashSet[Int]
    val sample = new Array[Int](math.min(n, max))
    while (seen.size < math.min(n, max)) {
      val next = rng.nextInt(max)
      if (!seen.contains(next)) {
        sample(seen.size) = next
        seen.add(next)
      }
    }
    sample
  }
}
