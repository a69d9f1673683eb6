package graft.multimodal

import graft.SparkSpec

/** The compressed-video path: AVI container round-trip, MJPEG frame
  * decompression fidelity (bounded lossy error vs the source raster),
  * sampling schedule, dimension-lie rejection, and the distributed
  * sampleMjpegFrames kernel incl. the driver-evidence batch. */
class AviSpec extends SparkSpec {

  private def gradient(w: Int, h: Int, phase: Int): Ppm.Image =
    Ppm.Image(w, h, Array.tabulate[Byte](w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      val x = p % w; val y = p / w
      ((x * 255 / (w - 1) * (2 - c) + y * 255 / (h - 1) * c) / 2 +
        phase).toByte
    })

  private def clip(w: Int = 24, h: Int = 16, n: Int = 5,
      fps: Int = 10): Avi.Mjpeg =
    Avi.Mjpeg(w, h, fps, 1,
      Vector.tabulate(n)(f => Jpeg.encode(gradient(w, h, f * 7))))

  test("container round-trip preserves geometry, timing, and frame bytes") {
    val m = clip()
    val d = Avi.decode(Avi.encode(m)).get
    assert((d.width, d.height, d.fpsNum, d.fpsDen) === ((24, 16, 10, 1)))
    assert(d.frames.length === 5)
    // the container is lossless around the already-encoded JPEGs
    d.frames.zip(m.frames).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
    assert(d.durationMs === 500L)
  }

  test("sampled frames decompress within the JPEG error bound") {
    val m = clip()
    val d = Avi.decode(Avi.encode(m)).get
    Avi.sampleIndices(d, 200L).foreach { idx =>
      val img = Avi.decodeFrame(d, idx).get
      val src = gradient(24, 16, idx * 7)
      val maxErr = img.pixels.indices
        .map(i => math.abs((img.pixels(i) & 0xff) - (src.pixels(i) & 0xff)))
        .max
      assert(maxErr <= 24, s"frame $idx err $maxErr") // JpegSpec's bound
    }
  }

  test("sampling schedule: every 200ms of a 10fps clip, deduped, in range") {
    val d = Avi.decode(Avi.encode(clip(n = 5, fps = 10))).get
    // duration 500ms → t ∈ {0,200,400} → frames {0,2,4}
    assert(Avi.sampleIndices(d, 200L) === Seq(0, 2, 4))
    assert(Avi.sampleIndices(d, 1000L) === Seq(0))
  }

  test("rejection: magic, size lies, frame-count lies, dimension lies") {
    val good = Avi.encode(clip())
    assert(Avi.decode(good).isDefined)
    assert(Avi.decode("nope".getBytes ++ good.drop(4)).isEmpty)
    // totalFrames forged in avih (offset: 12 + 8(LIST hdr) + 4(hdrl) +
    // 8(avih hdr) + 16)
    val badCount = good.clone(); badCount(48) = 9
    assert(Avi.decode(badCount).isEmpty)
    // truncated movi: a chunk size now points past the payload
    assert(Avi.decode(good.dropRight(10)).isEmpty)
    // dimension lie: container says 8×8, JPEGs are 24×16 — the container
    // parses but every frame decode refuses
    val m = clip()
    val lied = Avi.decode(Avi.encode(m.copy(width = 8, height = 8))).get
    assert(Avi.decodeFrame(lied, 0).isEmpty)
  }

  test("mjpegStats: the driver-evidence batch matches the closed formulas") {
    val rows = Multimodal.mjpegStats(spark, n = 8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === 16 + (id % 4).toInt * 8)
      assert(r.getAs[Int]("height") === 16 + (id % 3).toInt * 8)
      assert(r.getAs[Int]("n_frames") === 2 + (id % 5).toInt)
      val fps = 10 + (id % 5).toInt
      assert(r.getAs[Long]("frame_ms") ===
        r.getAs[Int]("frame_idx").toLong * 1000L / fps)
    }
    // every clip contributed at least its frame 0 — no silent drops
    assert(rows.map(_.getAs[Long]("media_id")).distinct.length === 8)
  }
}
