package graft.pipeline

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
  * The actual media codecs are NOT available in this environment, so
  * [[FakeCodec]] is a clearly-marked deterministic stand-in: it "decodes"
  * a header we synthesize, exercising the real Spark concerns — schema,
  * encoder round-trip, partition-level batching, null payloads — which is
  * what scales to 100 TB (payload bytes never pass through the driver, and
  * each partition decodes independently).
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

  /** Extracted features per media row. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      sampled_frames: Seq[Int])

  /** STUB codec — deterministic fake in place of a real image/audio decoder
    * (libs not present in this container). Decode = checksum + declared
    * dims; "frame sampling" = every `stride`-th frame index. The Spark-side
    * batch shape (partition-iterator in, iterator out) is the real contract.
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
        sampled_frames = 0 until row.meta_frames by math.max(frameStride, 1))
    }
  }

  /** Feature extraction over a media dataset — iterator-to-iterator so
    * Spark streams each partition through constant memory (no
    * materialization of the whole partition, safe for GB-scale payload
    * partitions).
    */
  def extractFeatures(media: Dataset[MediaRow], frameStride: Int = 10): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (one per task, not per row)
      rows.map(r => FakeCodec.decode(r, frameStride))
    }
  }

  /** Resize: payload-preserving metadata transform clamping both dimensions
    * to `maxDim` while keeping aspect ratio (integer arithmetic —
    * deterministic). A real implementation would re-encode the payload in
    * the same mapPartitions shape as [[extractFeatures]]; the STUB keeps the
    * payload bytes and rewrites the declared dimensions, which is the
    * Spark-side contract (schema in = schema out, payload column untouched
    * so the scan/shuffle cost model is realistic).
    */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val longest = math.max(r.meta_width, r.meta_height)
        if (longest <= maxDim) r
        else r.copy(
          meta_width = math.max(1, r.meta_width * maxDim / longest),
          meta_height = math.max(1, r.meta_height * maxDim / longest))
      }
    }
  }

  /** Synthesize a deterministic media table from any keyed DataFrame — used
    * by tests and bench to exercise the plumbing without real media.
    * Payload bytes derive from the key via repeated sha2, metadata from
    * simple arithmetic.
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
  }

  /** Aggregate feature stats (the query-shaped surface over media). */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"),
        sum(size(col("sampled_frames"))).cast(LongType).as("total_sampled"))
      .orderBy("kind")
}
