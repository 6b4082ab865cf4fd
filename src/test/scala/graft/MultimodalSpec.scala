package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Image decode: the REAL `javax.imageio` path for PNG/JPEG payloads
  * and the deterministic stub fallback for everything else, dispatched
  * by magic bytes inside one decode stage. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode takes the real imageio path for PNG payloads — true dims, not the stub's") {
    val png = Multimodal.encodePng(5L) // 21x17, fill rgb(5,35,65)
    val media = Seq((5L, "image", png)).toDF("media_id", "kind", "payload")
    val out = Multimodal.decode(spark, media).collect().head
    assert((out.width, out.height) === (21L, 17L))
    assert(out.n_frames === 1L)
    // the stub would have derived dims from byte length — prove the
    // real decoder disagrees with it on this payload
    val stubbed = Multimodal.decodeStub(
      Multimodal.MediaRow(5L, "image", png))
    assert((stubbed.width, stubbed.height) !== (out.width, out.height))
    // PNG signature visible in the first-frame hex
    assert(out.first_frame_hex.startsWith("89504e47"))
  }

  test("decode falls back to the stub for non-image payloads in the same stage") {
    val media = Seq((7L, "audio", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decode(spark, media).collect().head
    val expected = Multimodal.decodeStub(
      Multimodal.MediaRow(7L, "audio", "not an image".getBytes("UTF-8")))
    assert(out === expected)
  }

  test("audioDecode round trip matches the arithmetic contract (real javax.sound WAV decode)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wavdocs").toString
    val ids = Seq(0L, 1L, 3L, 63L, 64L, 127L, 500L)
    ids.map(id => (id, s"doc $id", "en", "src", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.audioDecode(spark, dir)
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("first_sample"))
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (id, rate, ch, frames, first) =>
      assert(rate === 8000 + (id % 4) * 4000)
      assert(ch === 1L)
      assert(frames === 32 + id % 64)
      assert(first === id % 127)
    }
  }

  test("imageDecode round trip matches the arithmetic contract for every id shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_imgdocs").toString
    val ids = Seq(0L, 1L, 31L, 32L, 255L, 256L, 1000L)
    ids.map(id => (id, s"doc $id", "en", "src", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.imageDecode(spark, dir)
      .select(col("media_id"), col("width"), col("height"),
        col("r"), col("g"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (id, w, h, r, g, b) =>
      assert(w === 16 + id % 32)
      assert(h === 12 + id % 23)
      assert((r, g, b) === (id % 256, (id * 7) % 256, (id * 13) % 256))
    }
  }
}
