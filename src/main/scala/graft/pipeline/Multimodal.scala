package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north_star): image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as per-partition batch
  * functions (the Scala analogue of `mapInPandas` — an iterator-to-iterator
  * `mapPartitions` over typed rows, one codec instantiation per partition,
  * not per row).
  *
  * Decode is REAL for images (PNG/JPEG/GIF/BMP via the in-JDK
  * `javax.imageio`) and audio (WAV/AIFF via the in-JDK
  * `javax.sound.sampled`) — no external media libraries exist in this
  * environment, so video payloads fall back to the clearly-marked
  * [[FakeCodec]] metadata path. Payload bytes never pass through the
  * driver, and each partition decodes independently — the property that
  * scales to 100 TB.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta_width: Int,
      meta_height: Int,
      meta_frames: Int)

  /** Extracted features per media row. `decoded` is true when a real codec
    * parsed the payload (then width/height — or sample_rate for audio — come
    * from the bytes, not the declared metadata).
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      sampled_frames: Seq[Int],
      decoded: Boolean,
      mean_luma: Double, // images: mean 0-255 luminance over a bounded sample grid
      sample_rate: Double) // audio: Hz

  /** Pure-JVM image codec: decode via `javax.imageio` (PNG/JPEG/GIF/BMP
    * readers ship with the JDK), features from the raster, resize by
    * Graphics2D redraw + PNG re-encode.
    */
  object ImageCodec {
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.length == 0) None
      else
        try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case NonFatal(_) => None }

    /** Mean 0-255 luminance (Rec.601 weights) over at most a 64×64 sample
      * grid — constant per-image cost regardless of resolution.
      */
    def meanLuma(img: java.awt.image.BufferedImage): Double = {
      val stepX = math.max(1, img.getWidth / 64)
      val stepY = math.max(1, img.getHeight / 64)
      var sum = 0.0
      var n = 0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sum += 0.299 * r + 0.587 * g + 0.114 * b
          n += 1
          x += stepX
        }
        y += stepY
      }
      if (n == 0) 0.0 else sum / n
    }

    /** Scale so the longest side is `maxDim` (no upscaling), re-encode as
      * PNG. Returns (bytes, width, height).
      */
    def resizePng(img: java.awt.image.BufferedImage, maxDim: Int): (Array[Byte], Int, Int) = {
      val longest = math.max(img.getWidth, img.getHeight)
      val (w, h) =
        if (longest <= maxDim) (img.getWidth, img.getHeight)
        else (math.max(1, img.getWidth * maxDim / longest),
          math.max(1, img.getHeight * maxDim / longest))
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (bos.toByteArray, w, h)
    }

    /** Deterministic tiny PNG (gradient keyed by `seed`) — synthesis helper. */
    def encodePng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 255 / math.max(1, w - 1)) + seed) & 0xff
          val g = ((y * 255 / math.max(1, h - 1)) + seed * 7) & 0xff
          val b = (seed * 131) & 0xff
          img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Pure-JVM audio codec: WAV/AIFF headers via `javax.sound.sampled`. */
  object AudioCodec {
    final case class AudioInfo(frames: Long, sampleRate: Double, channels: Int)

    def decode(bytes: Array[Byte]): Option[AudioInfo] =
      if (bytes == null || bytes.length == 0) None
      else
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new ByteArrayInputStream(bytes))
          Some(AudioInfo(aff.getFrameLength.toLong, aff.getFormat.getSampleRate.toDouble,
            aff.getFormat.getChannels))
        } catch { case NonFatal(_) => None }

    /** Deterministic mono 16-bit PCM WAV (`frames` samples of a sine keyed
      * by `seed`) — synthesis helper; hand-built RIFF header + samples.
      */
    def encodeWav(seed: Long, frames: Int, sampleRate: Int = 8000): Array[Byte] = {
      val dataLen = frames * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < frames) {
        val v = (math.sin((i + seed) * 0.1) * Short.MaxValue * 0.5).toShort
        bb.putShort(v)
        i += 1
      }
      bb.array()
    }
  }

  /** STUB codec — deterministic fallback for payloads no in-JDK codec can
    * parse (video, or corrupt bytes). Decode = checksum + declared dims;
    * "frame sampling" = every `stride`-th frame index. Clearly marked:
    * features carry `decoded = false`.
    */
  object FakeCodec {
    def checksum(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }

    def decode(row: MediaRow, frameStride: Int): MediaFeatures = {
      val bytes = Option(row.payload).getOrElse(Array.emptyByteArray)
      MediaFeatures(
        media_id = row.media_id,
        kind = row.kind,
        n_bytes = bytes.length,
        checksum = checksum(bytes),
        width = row.meta_width,
        height = row.meta_height,
        sampled_frames = 0 until row.meta_frames by math.max(frameStride, 1),
        decoded = false,
        mean_luma = 0.0,
        sample_rate = 0.0)
    }
  }

  /** Feature extraction over a media dataset — iterator-to-iterator so
    * Spark streams each partition through constant memory (no
    * materialization of the whole partition, safe for GB-scale payload
    * partitions). Images and audio decode for real (in-JDK codecs); other
    * kinds fall back to [[FakeCodec]] with `decoded = false`.
    */
  def extractFeatures(media: Dataset[MediaRow], frameStride: Int = 10): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec state would initialize here (one per task)
      rows.map { r =>
        val base = FakeCodec.decode(r, frameStride)
        r.kind match {
          case "image" =>
            ImageCodec.decode(r.payload) match {
              case Some(img) => base.copy(
                width = img.getWidth, height = img.getHeight,
                decoded = true, mean_luma = ImageCodec.meanLuma(img))
              case None => base
            }
          case "audio" =>
            AudioCodec.decode(r.payload) match {
              case Some(a) => base.copy(
                sampled_frames = 0 until a.frames.toInt by math.max(frameStride, 1),
                decoded = true, sample_rate = a.sampleRate)
              case None => base
            }
          case _ => base
        }
      }
    }
  }

  /** Resize: for decodable images, a REAL resample (Graphics2D bilinear +
    * PNG re-encode — payload, width, and height all change); otherwise a
    * payload-preserving metadata clamp keeping aspect ratio. Same
    * iterator-to-iterator shape as [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageCodec.decode(r.payload) match {
          case Some(img) if r.kind == "image" =>
            if (math.max(img.getWidth, img.getHeight) <= maxDim)
              r.copy(meta_width = img.getWidth, meta_height = img.getHeight)
            else {
              val (bytes, w, h) = ImageCodec.resizePng(img, maxDim)
              r.copy(payload = bytes, meta_width = w, meta_height = h)
            }
          case _ =>
            val longest = math.max(r.meta_width, r.meta_height)
            if (longest <= maxDim) r
            else r.copy(
              meta_width = math.max(1, r.meta_width * maxDim / longest),
              meta_height = math.max(1, r.meta_height * maxDim / longest))
        }
      }
    }
  }

  /** Synthesize a deterministic media table — REAL payloads for image rows
    * (tiny PNGs) and audio rows (PCM WAVs), an opaque hash payload for
    * video (no pure-JVM video codec exists). Encoding runs distributed in
    * the same mapPartitions shape the decode path uses.
    */
  def synthesize(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .select(
        col("id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
        sha2(col("id").cast(StringType), 256).cast(BinaryType).as("payload"),
        (pmod(col("id"), lit(64)) + 16).cast(IntegerType).as("meta_width"),
        (pmod(col("id"), lit(48)) + 16).cast(IntegerType).as("meta_height"),
        (pmod(col("id"), lit(30)) + 1).cast(IntegerType).as("meta_frames"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          r.kind match {
            case "image" =>
              r.copy(payload = ImageCodec.encodePng(r.media_id, r.meta_width, r.meta_height))
            case "audio" =>
              r.copy(payload = AudioCodec.encodeWav(r.media_id, r.meta_frames * 160))
            case _ => r // video: opaque bytes, FakeCodec path
          }
        }
      }
  }

  /** Aggregate feature stats (the query-shaped surface over media). */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"),
        sum(size(col("sampled_frames"))).cast(LongType).as("total_sampled"),
        sum(when(col("decoded"), 1L).otherwise(0L)).as("decoded_cnt"),
        round(avg(col("mean_luma")), 4).as("avg_luma"))
      .orderBy("kind")
}
