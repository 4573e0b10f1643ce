package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data slice: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by a
  * per-partition batch kernel.
  *
  * Image payloads are REALLY decoded via `javax.imageio` (JDK-built-in —
  * PNG/BMP/GIF/JPEG, zero external dependencies): dimensions and channel
  * count come from the decoded raster, the histogram/mean from its sample
  * values. Payloads ImageIO cannot parse (non-image media, corrupt bytes,
  * the synthetic text-byte payloads the testdata ships) fall back to a
  * deterministic raw-byte feature extraction, so every row still produces a
  * feature vector — decode failures are observable as `decoded = 0`, not
  * dropped rows. Audio/video codecs remain out of scope (no libs in this
  * environment); their payloads take the byte-feature fallback path.
  */
object Multimodal {

  /** Per-partition image decoder + feature extractor. */
  object ImageDecoder {
    final case class Features(width: Int, height: Int, channels: Int,
                              hist: Array[Long], mean: Double, decoded: Boolean)

    /** Deterministic raw-byte fallback: 8-bin byte histogram + mean byte,
      * width ≈ sqrt(n) (an "as-if-square" shape so downstream schema logic
      * always sees plausible dims).
      */
    def byteFeatures(payload: Array[Byte]): Features = {
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
      Features(w, math.max(1, n / w), 3, hist, if (n == 0) 0.0 else sum.toDouble / n, decoded = false)
    }

    /** Real decode: ImageIO sniffs the container from magic bytes; on any
      * parse failure (null image or exception) the byte fallback runs.
      * Histogram/mean aggregate every raster sample (all bands), masked to
      * 8 bits — deterministic for the integer-sample image types ImageIO
      * produces.
      */
    def decode(payload: Array[Byte]): Features = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) byteFeatures(payload)
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val bands = raster.getNumBands
        val hist = new Array[Long](8)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) {
              val v = raster.getSample(x, y, b) & 0xff
              hist(v >>> 5) += 1
              sum += v
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val count = w.toLong * h * bands
        Features(w, h, bands, hist, if (count == 0) 0.0 else sum.toDouble / count, decoded = true)
      }
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
        // per-partition decoder setup: disable ImageIO's disk-backed stream
        // cache once (per-call tmp files would serialize the partition on
        // filesystem churn); the codec registry itself is JVM-global
        javax.imageio.ImageIO.setUseCache(false)
        iter.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val f = ImageDecoder.decode(bytes)
          (id, f.width, f.height, f.channels,
            f.hist(0), f.hist(1), f.hist(2), f.hist(3), f.hist(4), f.hist(5), f.hist(6), f.hist(7),
            f.mean, if (f.decoded) 1 else 0)
        }
      }
      .toDF("media_id", "width", "height", "channels",
        "hist_0", "hist_1", "hist_2", "hist_3", "hist_4", "hist_5", "hist_6", "hist_7",
        "mean_byte", "decoded")
  }
}
