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

  test("AVI container round trip: parse walks the RIFF tree, counts strl tracks") {
    Seq(0L, 2L, 4L, 30L, 88L, 1000L).foreach { id =>
      val out = Multimodal.parseAvi(id, Multimodal.encodeAvi(id))
      assert(out.container === "avi")
      assert(out.n_tracks === 1 + id % 3)
      assert(out.width === 160 + (id % 16) * 8)
      assert(out.height === 120 + (id % 9) * 8)
      assert(out.duration_ms === (20000 + (id % 30) * 1000) * (100 + id % 400) / 1000)
    }
  }

  test("MP4 container round trip: parse walks the box tree, recovers 16.16 dims") {
    Seq(1L, 3L, 5L, 17L, 999L, 10001L).foreach { id =>
      val out = Multimodal.parseMp4(id, Multimodal.encodeMp4(id))
      assert(out.container === "mp4")
      assert(out.n_tracks === 1 + id % 3)
      assert(out.width === 320 + (id % 32) * 4)
      assert(out.height === 240 + (id % 18) * 4)
      assert(out.duration_ms === 5000 + id % 9999)
    }
  }

  test("container parsers reject non-container bytes instead of fabricating metadata") {
    intercept[IllegalArgumentException] {
      Multimodal.parseAvi(1L, "not a riff container at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseMp4(2L, Array.fill[Byte](64)(0x41))
    }
  }

  test("videoProbe query: even ids AVI, odd ids MP4, metadata from the structure") {
    val dir = java.nio.file.Files.createTempDirectory("graft_videodocs").toString
    val ids = Seq(0L, 1L, 2L, 3L, 100L, 101L)
    ids.map(id => (id, s"doc $id", "en", "src", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.videoProbe(spark, dir)
      .select(col("media_id"), col("container"), col("n_tracks"),
        col("width"), col("height"), col("duration_ms"))
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(rows.length === ids.length)
    rows.foreach { case (id, container, n, w, h, d) =>
      assert(container === (if (id % 2 == 0) "avi" else "mp4"))
      assert(n === 1 + id % 3)
      if (id % 2 == 0) {
        assert((w, h) === (160 + (id % 16) * 8, 120 + (id % 9) * 8))
        assert(d === (20000 + (id % 30) * 1000) * (100 + id % 400) / 1000)
      } else {
        assert((w, h) === (320 + (id % 32) * 4, 240 + (id % 18) * 4))
        assert(d === 5000 + id % 9999)
      }
    }
  }
}
