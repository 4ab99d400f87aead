package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §2.10 D4, driver-mandated): treat
  * image/audio/video payloads as opaque `binary` columns with a typed
  * metadata struct, and run decode / feature-extraction / frame-sampling
  * as distributed column transforms.
  *
  * The Spark-side plumbing — binary content column, metadata struct schema,
  * per-row feature extraction, frame explosion with bounded fan-out — is
  * real and tested. The *codec* itself is STUBBED with a deterministic
  * byte-derived fake (this container ships no image/audio libraries): the
  * `stub*` functions stand where a JNI/codec call would decode real bytes.
  * At 100 TB the decode is embarrassingly parallel (narrow map over
  * binary), so the plumbing, not the codec, is the scalability surface.
  */
object Multimodal {

  /** Metadata struct for an opaque payload: mime type inferred from an id
    * (stand-in for magic-byte sniffing) + byte size.
    */
  def withContent(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("mime",
        when(pmod(col(idCol), lit(3)) === 0, "image/png")
          .when(pmod(col(idCol), lit(3)) === 1, "audio/wav")
          .otherwise("video/mp4"))
      .withColumn("meta", struct(
        col("mime"),
        octet_length(col("content")).as("n_bytes")))

  /** STUB decode — image dimensions. A real build calls an image codec
    * here; the fake derives deterministic dims from the byte length so the
    * downstream plumbing (schema, partitioning, joins) is exercised
    * honestly.
    */
  def stubWidth(content: Column): Column =
    pmod(octet_length(content), lit(640)) + lit(1)

  def stubHeight(content: Column): Column =
    pmod(octet_length(content), lit(480)) + lit(1)

  /** STUB decode — media duration in ms (audio/video), byte-derived. */
  def stubDurationMs(content: Column): Column =
    (octet_length(content).cast("long") * 10L) + 1000L

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` cadence, bounded by `maxFrames` (fan-out control — at scale
    * an unbounded explode on a long video is a row bomb).
    */
  def sampleFrames(df: DataFrame, everyMs: Long, maxFrames: Int): DataFrame = {
    val nFrames = least(
      (stubDurationMs(col("content")) / everyMs).cast("int") + 1,
      lit(maxFrames))
    df.filter(col("mime") === "video/mp4")
      .withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame_offset_ms", col("frame_idx") * everyMs)
  }
}
