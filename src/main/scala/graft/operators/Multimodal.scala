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
  * dropped rows. Audio payloads are likewise really decoded via
  * `javax.sound.sampled` (JDK-built-in — WAV/AIFF/AU containers, PCM
  * codecs): sample rate / channels / frame count from the parsed header,
  * amplitude histogram + mean from the PCM samples normalized to 16-bit
  * signed. Video codecs remain out of scope (no libs in this environment);
  * their payloads take the byte-feature fallback path.
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

  /** Per-partition audio decoder + feature extractor (WAV/AIFF/AU via
    * `javax.sound.sampled`; every PCM shape is normalized to 16-bit signed
    * through the JDK's format converters before feature extraction).
    */
  object AudioDecoder {
    final case class Features(channels: Int, sampleRate: Int, nFrames: Long, durationSec: Double,
                              hist: Array[Long], mean: Double, decoded: Boolean)

    /** Deterministic raw-byte fallback (non-audio/corrupt payloads): 8-bin
      * byte histogram + mean byte; frame count = byte count, rate 0.
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
      Features(1, 0, n.toLong, 0.0, hist, if (n == 0) 0.0 else sum.toDouble / n, decoded = false)
    }

    /** Real decode: the audio system sniffs the container from magic bytes;
      * any parse/convert failure falls back to byte features. Samples are
      * normalized to 16-bit signed little-endian PCM at the source rate and
      * channel count, then binned by their high byte shifted to unsigned
      * ([0,255] — the same 8-bin layout as the image histogram), so the
      * features are deterministic across PCM widths of the same content.
      */
    /** Container magic bytes of the formats the stock JRE audio system
      * reads (WAV "RIFF", AIFF/AIFC "FORM", AU ".snd"). Payloads that match
      * none of them cannot decode — `getAudioInputStream` would only
      * iterate every provider and throw `UnsupportedAudioFileException`,
      * which costs a filled-in stack trace PER ROW on a corpus where most
      * payloads are not audio (measured ~4× the whole query's runtime vs
      * the sniffed fallback). Sniff first; the exception path remains for
      * matching-but-corrupt payloads, with the identical byte-fallback
      * result either way.
      */
    private def looksLikeAudio(p: Array[Byte]): Boolean =
      p.length >= 4 &&
        ((p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
          (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') ||
          (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

    def decode(payload: Array[Byte]): Features = {
      if (!looksLikeAudio(payload)) return byteFeatures(payload)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val base = ais.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            base.getSampleRate, 16, base.getChannels, true, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
          val nCh = math.max(1, target.getChannels)
          val hist = new Array[Long](8)
          var sum = 0L
          var nSamples = 0L
          // AudioInputStream reads whole frames; frame size = 2 bytes/sample × channels
          val buf = new Array[Byte](pcm.getFormat.getFrameSize * 1024)
          var read = pcm.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val s = ((buf(i + 1).toInt << 8) | (buf(i) & 0xff)) // 16-bit signed LE
              val v = ((s >> 8) + 128) & 0xff // high byte shifted to [0,255]
              hist(v >>> 5) += 1
              sum += v
              nSamples += 1
              i += 2
            }
            read = pcm.read(buf)
          }
          val frames = nSamples / nCh
          val rate = math.round(target.getSampleRate)
          Features(nCh, rate, frames, if (rate > 0) frames.toDouble / rate else 0.0,
            hist, if (nSamples == 0) 0.0 else sum.toDouble / nSamples, decoded = true)
        } finally ais.close()
      } catch { case _: Exception => byteFeatures(payload) }
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

  /** Audio analog of [[extractFeatures]]: per-partition batch decode of an
    * opaque binary column into a fixed scalar feature schema (header fields
    * + amplitude histogram). Same plumbing contract: no row is dropped,
    * undecodable payloads carry `decoded = 0` byte features.
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val f = AudioDecoder.decode(bytes)
          (id, f.channels, f.sampleRate, f.nFrames, f.durationSec,
            f.hist(0), f.hist(1), f.hist(2), f.hist(3), f.hist(4), f.hist(5), f.hist(6), f.hist(7),
            f.mean, if (f.decoded) 1 else 0)
        }
      }
      .toDF("media_id", "channels", "sample_rate", "n_frames", "duration_sec",
        "hist_0", "hist_1", "hist_2", "hist_3", "hist_4", "hist_5", "hist_6", "hist_7",
        "mean_amp", "decoded")
  }
}
