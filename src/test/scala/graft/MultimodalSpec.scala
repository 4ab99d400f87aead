package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing specs (SURVEY.md §2.10 D4): binary content columns,
  * metadata structs, stub decode, bounded frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mm = Multimodal.withContent(
    Seq((0L, "a tiny payload"), (1L, "another somewhat longer payload"),
      (2L, "video-ish bytes here"))
      .toDF("doc_id", "text"),
    "text", "doc_id")

  test("content is binary with byte-accurate metadata") {
    val r = mm.select($"doc_id", $"meta.n_bytes", $"mime").orderBy($"doc_id")
      .as[(Long, Int, String)].collect().toSeq
    assert(r == Seq((0L, 14, "image/png"), (1L, 31, "audio/wav"),
      (2L, 20, "video/mp4")))
    assert(mm.schema("content").dataType.typeName == "binary")
  }

  test("stub decode is deterministic and byte-derived") {
    val r = mm.filter($"doc_id" === 0)
      .select(Multimodal.stubWidth($"content"),
        Multimodal.stubHeight($"content"),
        Multimodal.stubDurationMs($"content")).head()
    assert(r.getInt(0) == 15) // 14 % 640 + 1
    assert(r.getInt(1) == 15) // 14 % 480 + 1
    assert(r.getLong(2) == 1140) // 14*10 + 1000
  }

  test("frame sampling explodes only video rows, bounded by maxFrames") {
    val frames = Multimodal.sampleFrames(mm, everyMs = 100L, maxFrames = 4)
      .select($"doc_id", $"frame_idx", $"frame_offset_ms")
      .as[(Long, Int, Long)].collect().toSeq
    assert(frames.map(_._1).distinct == Seq(2L)) // only the video doc
    assert(frames.size == 4) // duration 1200ms / 100ms = 13 frames, capped
    assert(frames.map(_._3) == Seq(0L, 100L, 200L, 300L))
  }
}
