package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data slice: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by a
  * per-partition batch kernel.
  *
  * The actual media decode is a STUB (this environment ships no image/audio
  * libraries): [[FakeDecoder]] is a deterministic stand-in that computes
  * features from raw bytes. Everything around it — schema, batching,
  * partition-level kernel hoisting, feature output shape — is the real
  * Spark-side plumbing a production decoder would drop into (swap
  * `FakeDecoder.decode` for the JNI/native call; the dataflow is unchanged).
  */
object Multimodal {

  /** Deterministic stand-in for an image decoder + feature extractor.
    * STUB: replace with a real codec; signature and batch shape are final.
    */
  object FakeDecoder {
    /** "Decode" bytes → (width, height, channels, 8-bin byte histogram, mean byte). */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Long], Double) = {
      val n = payload.length
      val hist = new Array[Long](8)
      var sum = 0L
      var i = 0
      while (i < n) {
        val b = payload(i) & 0xff
        hist(b >>> 5) += 1
        sum += b
        i += 1
      }
      val w = math.max(1, math.sqrt(n.toDouble).toInt)
      (w, math.max(1, n / w), 3, hist, if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Wrap a text corpus into a fake multimodal table: (id, media_type,
    * payload binary, n_bytes) — used by tests/queries since the testdata
    * ships no real media.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit("image/fake").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      length(col(textCol)).as("n_bytes")
    )

  /** Batch feature extraction over the binary column: typed Dataset
    * `mapPartitions` (decoder state hoisted once per partition — where a
    * real decoder would allocate its native context), emitting a fixed
    * feature schema suitable for downstream ANN / dedup.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    // Histogram bins are emitted as 8 scalar columns (hist_0..hist_7)
    // rather than one array column: scalar columns stay inside whole-stage
    // codegen downstream and dump/compare surfaces (parquet → pandas →
    // hash) handle them natively, where array cells do not.
    media.select(col("media_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // decoder context initialized once per partition (STUB: trivial)
        val decoder = FakeDecoder
        iter.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val (w, h, c, hist, mean) = decoder.decode(bytes)
          (id, w, h, c, hist(0), hist(1), hist(2), hist(3), hist(4), hist(5), hist(6), hist(7), mean)
        }
      }
      .toDF("media_id", "width", "height", "channels",
        "hist_0", "hist_1", "hist_2", "hist_3", "hist_4", "hist_5", "hist_6", "hist_7", "mean_byte")
  }
}
