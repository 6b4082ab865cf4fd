package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Round-10 additions: MJPEG-in-AVI real frame decode. */
class Round10Spec extends SparkSpec {

  test("MJPEG AVI is a valid RIFF container: the probe walker recovers its header") {
    for (id <- 0L to 12L) {
      val bytes = Multimodal.encodeMjpegAvi(id)
      val v = Multimodal.parseAvi(id, bytes)
      assert(v.container === "avi")
      assert(v.n_tracks === 1L)
      assert(v.width === Multimodal.mjpegW(id, 0).toLong)
      assert(v.height === Multimodal.mjpegH(id, 0).toLong)
    }
  }

  test("the lossy codec is bit-exact on the uniform rasters: EVERY decoded pixel equals g") {
    // the load-bearing claim behind q260's arithmetic gate: a uniform
    // gray raster's DCT is DC-only, the level-shifted DC is an exact
    // multiple of the DC quantization step, and neutral chroma
    // round-trips R=G=B — so the JPEG writer+reader is exact here
    for (id <- 0L to 20L) {
      val frames = Multimodal.aviVideoChunks(id, Multimodal.encodeMjpegAvi(id))
      assert(frames.length === Multimodal.mjpegFrameCount(id))
      frames.zipWithIndex.foreach { case (jb, f) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jb))
        assert(img.getWidth === Multimodal.mjpegW(id, f))
        assert(img.getHeight === Multimodal.mjpegH(id, f))
        val g = Multimodal.mjpegGray(id, f)
        val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
        px.foreach { p =>
          assert(((p >> 16) & 0xff) === g, s"id=$id f=$f R")
          assert(((p >> 8) & 0xff) === g, s"id=$id f=$f G")
          assert((p & 0xff) === g, s"id=$id f=$f B")
        }
      }
    }
  }

  test("odd-length JPEG chunks are word-padded and the walker skips the pad byte") {
    // at least one id in a small range must produce an odd JPEG (JPEG
    // lengths are effectively arbitrary); all ids must walk cleanly
    // regardless — a walker that forgets the pad byte desynchronizes
    // on the first odd chunk and misses every later frame
    var sawOdd = false
    for (id <- 0L to 40L) {
      val frames = Multimodal.aviVideoChunks(id, Multimodal.encodeMjpegAvi(id))
      assert(frames.length === Multimodal.mjpegFrameCount(id))
      if (frames.exists(_.length % 2 == 1)) sawOdd = true
    }
    assert(sawOdd, "fixture never produced an odd-length JPEG — pad path untested")
  }

  test("aviVideoChunks rejects non-AVI bytes loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.aviVideoChunks(7L, Array[Byte](1, 2, 3, 4))
    }
    intercept[IllegalArgumentException] {
      // a RIFF that is not an AVI (WAVE) must not be walked as one
      Multimodal.aviVideoChunks(7L, Multimodal.encodeWav(7L))
    }
  }

  test("mjpegFrames emits one row per (id, frame) with exact sums at sf0.001") {
    val out = Multimodal.mjpegFrames(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val expected = rows.forall { r =>
      val id = r.getAs[Long]("media_id")
      val f = r.getAs[Long]("frame_idx").toInt
      val (w, h, g) = (Multimodal.mjpegW(id, f), Multimodal.mjpegH(id, f),
        Multimodal.mjpegGray(id, f))
      r.getAs[Long]("width") == w && r.getAs[Long]("height") == h &&
        r.getAs[Long]("gray00") == g &&
        r.getAs[Long]("gray_sum") == g.toLong * w * h &&
        r.getAs[Long]("n_frames") == Multimodal.mjpegFrameCount(id).toLong
    }
    assert(expected)
    val perId = rows.groupBy(_.getAs[Long]("media_id"))
    assert(perId.forall { case (id, rs) =>
      rs.length == Multimodal.mjpegFrameCount(id) })
  }
}
