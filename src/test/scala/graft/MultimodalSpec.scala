package graft

import graft.sources.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a" * 200), (1L, "b" * 130), (2L, "mixed content 123")
  ).toDF("doc_id", "text")

  test("binary plumbing: schema, determinism, metadata") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq) // decode is deterministic
    assert(f1(0).n_bytes === 200L)
    assert(f1(0).format === "png")
    // 'a' = 0x61 → brightness 97/255 for a uniform payload
    assert(math.abs(f1(0).brightness - 97.0 / 255.0) < 1e-4)
  }

  test("frame sampling emits every stride-th fixed-size chunk") {
    val media = Multimodal.fromDocuments(docs)
    val frames = Multimodal.sampleFrames(media, frameBytes = 50, stride = 2)
      .where($"media_id" === 0L).collect()
    // 200 bytes / 50 = 4 frames, stride 2 → frames 0 and 2
    assert(frames.map(_.getLong(1)).sorted.toSeq === Seq(0L, 2L))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_payload").length === 50))
  }
}
