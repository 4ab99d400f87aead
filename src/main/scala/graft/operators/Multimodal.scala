package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed rows for the batch-decode path (top-level for Encoder derivation). */
final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
final case class DecodedMedia(doc_id: Long, mime: String, width: Int,
    height: Int, duration_ms: Long, checksum: Long)

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

  /** Batch decode over partition iterators — the Scala analog of the
    * mapInPandas batch-UDF shape: the "codec" receives a whole partition
    * ITERATOR, so a real implementation initializes its codec/JNI handle
    * ONCE per partition and streams rows through it (exactly what a
    * pandas batch amortizes), instead of per row. Narrow map — no
    * shuffle, embarrassingly parallel at 100 TB. The decode itself is
    * the documented stub (byte-length dims + an FNV-1a content
    * checksum); dims match the expression stubs, spec-asserted.
    */
  def decodePartitions(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition codec-handle init happens HERE, once
      rows.map { m =>
        val n = m.content.length
        var h = -3750763034362895579L // FNV-1a 64 offset basis
        var i = 0
        while (i < n) { h = (h ^ (m.content(i) & 0xff)) * 1099511628211L; i += 1 }
        DecodedMedia(m.doc_id, m.mime, n % 640 + 1, n % 480 + 1,
          n.toLong * 10L + 1000L, h)
      }
    }
  }

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
