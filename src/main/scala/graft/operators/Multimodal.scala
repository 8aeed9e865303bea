package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-parallel typed
  * `mapPartitions` (the Scala analog of `mapInPandas` batch processing),
  * fan-out via generator expressions — while the codec itself is a
  * STUB: no image/audio libraries exist in this environment, so
  * [[decodeStub]] derives deterministic pseudo-features from the raw
  * bytes. Swapping in a real decoder changes ONLY the function body
  * passed to `mapPartitions`; every boundary (row schema, batching,
  * partitioning, output contract) is exercised as-is by tests/oracles.
  */
object Multimodal {

  /** One media row: payload + metadata, the schema a 100 TB media lake
    * would carry per object (binary column + struct of typed metadata).
    */
  case class MediaRow(media_id: Long, format: String, width: Int, height: Int,
                      n_frames: Int, payload: Array[Byte])

  /** Extracted features per media object (decode output contract). */
  case class MediaFeatures(media_id: Long, format: String, byte_len: Long,
                           checksum: Long, mean_byte: Double, frames_sampled: Int)

  private val Formats = Seq("jpeg", "png", "wav", "mp4")

  /** Synthesize the media table from `documents`: payload = the raw text
    * bytes (a stand-in blob), metadata derived deterministically from
    * doc_id — every downstream stage treats payload as opaque bytes, so
    * nothing changes when the blobs become real JPEG/WAV data. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(
        array(Formats.map(lit): _*), (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
        .as("format"),
      (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
      (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("n_frames"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }

  /** Metadata projection (no decode) — pure relational face of the media
    * table, oracle-checkable. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF().select(
      col("media_id"), col("format"), col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      col("n_frames").cast("long").as("n_frames"),
      length(col("payload")).cast("long").as("byte_len"))

  /** STUB decode + feature extraction. Real deployments replace the body
    * with an actual codec (??? markers note exactly where); the
    * deterministic fake keeps every Spark boundary testable:
    * partition-batched iteration, typed input/output rows, no
    * driver-side collection. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition init is where a real codec would open its
      // library context once per task (the mapInPandas batch pattern).
      rows.map { r =>
        // ??? real decode goes here: BufferedImage / libsndfile / ffmpeg.
        // Deterministic fake features over the opaque bytes:
        val bytes = r.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
        MediaFeatures(
          media_id = r.media_id,
          format = r.format,
          byte_len = bytes.length.toLong,
          checksum = graft.functions.Fnv1a64.hash(bytes),
          mean_byte = if (bytes.isEmpty) 0.0
            else math.rint(sum.toDouble / bytes.length * 10000) / 10000,
          frames_sampled = math.min(r.n_frames, 4))
      }
    }
  }

  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    decodeStub(mediaTable(spark, sfDir)).toDF()

  /** Resize stage: recompute target dimensions (fit inside maxW×maxH,
    * aspect preserved, integer arithmetic) and pass the payload through
    * untouched — where a real pipeline would transcode, the ??? marker
    * in [[decodeStub]] applies equally. The metadata math is real and
    * oracle-checkable. */
  def resizeMeta(spark: SparkSession, sfDir: String,
                 maxW: Int = 640, maxH: Int = 360): DataFrame = {
    val m = mediaTable(spark, sfDir).toDF()
    // scale = min(maxW/w, maxH/h, 1) as exact rational arithmetic:
    // out_w = floor(w * min-scale) via integer compare of cross products
    val fitW = col("width") * maxH <= col("height") * maxW // height binds?
    m.select(
      col("media_id"),
      col("width").cast("long").as("src_w"),
      col("height").cast("long").as("src_h"),
      when(col("width") <= maxW && col("height") <= maxH, col("width").cast("long"))
        .when(fitW, expr(s"CAST(width AS BIGINT) * $maxH div height"))
        .otherwise(maxW.toLong).as("out_w"),
      when(col("width") <= maxW && col("height") <= maxH, col("height").cast("long"))
        .when(fitW, lit(maxH.toLong))
        .otherwise(expr(s"CAST(height AS BIGINT) * $maxW div width")).as("out_h"))
  }

  /** Frame sampling: fan one video row out to ceil(n_frames/stride)
    * frame rows — generator fan-out (`explode(sequence(...))`), the
    * UDTF analog (SURVEY §2.10), oracle-checkable. */
  def frameSample(spark: SparkSession, sfDir: String, stride: Int = 8): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_no"))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"))
}
