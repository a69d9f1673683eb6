package graft.multimodal

import graft.SparkSpec

/** The real Y4M kernel: header parsing, 4:2:0/4:4:4 plane math, truncated
  * and forged-header rejection, YUV→RGB, frame sampling, and the
  * distributed sampleVideoFrames path incl. undecodable fallthrough. */
class Y4mSpec extends SparkSpec {

  private def vid(w: Int = 8, h: Int = 6, nFrames: Int = 4,
      subsampled: Boolean = true, fn: Int = 25, fd: Int = 1): Y4m.Video = {
    val fb = if (subsampled) w * h * 3 / 2 else w * h * 3
    val frames = Vector.tabulate(nFrames)(f =>
      Array.tabulate[Byte](fb)(i => ((i * 3 + f * 50) % 256).toByte))
    Y4m.Video(w, h, fn, fd, subsampled, frames)
  }

  test("encode/decode round-trip is bit-exact (420 and 444)") {
    for (sub <- Seq(true, false)) {
      val v = vid(subsampled = sub)
      val d = Y4m.decode(Y4m.encode(v)).get
      assert(d.width === v.width && d.height === v.height)
      assert(d.fpsNum === v.fpsNum && d.fpsDen === v.fpsDen)
      assert(d.subsampled === sub)
      assert(d.frames.size === v.frames.size)
      assert(d.frames.zip(v.frames).forall { case (a, b) =>
        a.toSeq == b.toSeq
      })
    }
  }

  test("C420 variants parse; default chroma is 420; maxFrames bounds work") {
    val v = vid(nFrames = 5)
    val enc = Y4m.encode(v)
    val s = new String(enc.takeWhile(_ != '\n'), "US-ASCII")
    for (tag <- Seq("C420jpeg", "C420mpeg2", "C420paldv")) {
      val patched = s.replace("C420", tag).getBytes("US-ASCII") ++
        enc.dropWhile(_ != '\n')
      assert(Y4m.decode(patched).get.subsampled)
    }
    // drop the C param entirely → default 420
    val noC = s.replace(" C420", "").getBytes("US-ASCII") ++
      enc.dropWhile(_ != '\n')
    assert(Y4m.decode(noC).get.subsampled)
    assert(Y4m.decode(enc, maxFrames = 2).get.frames.size === 2)
  }

  test("rejection: magic, missing dims, odd 420 dims, bad chroma, truncation") {
    val enc = Y4m.encode(vid())
    assert(Y4m.decode(null) === None)
    assert(Y4m.decode("MPEG4".getBytes) === None)
    val s = new String(enc.takeWhile(_ != '\n'), "US-ASCII")
    def patched(f: String => String): Array[Byte] =
      f(s).getBytes("US-ASCII") ++ enc.dropWhile(_ != '\n')
    assert(Y4m.decode(patched(_.replace(" W8", ""))) === None)
    assert(Y4m.decode(patched(_.replace("W8", "W7"))) === None)   // odd 420
    assert(Y4m.decode(patched(_.replace("W8", "Wx"))) === None)
    assert(Y4m.decode(patched(_.replace("F25:1", "F0:1"))) === None)
    assert(Y4m.decode(patched(_.replace("C420", "C422"))) === None)
    assert(Y4m.decode(patched(_.replace("C420", "Z420"))) === None)
    // forged giant dims must be rejected before allocation
    assert(Y4m.decode(patched(_.replace("W8", "W100000")
      .replace("H6", "H100000"))) === None)
    // truncated frame payload
    assert(Y4m.decode(enc.dropRight(5)) === None)
    // garbage where FRAME marker should be
    val bad = enc.clone()
    val firstFrame = new String(enc, "ISO-8859-1").indexOf("FRAME")
    bad(firstFrame) = 'X'
    assert(Y4m.decode(bad) === None)
  }

  test("frameToRgb: BT.601 limited-range conversion on known values") {
    // gray frame: Y=128, U=V=128 → R=G=B≈130 ((128-16)*298+128)>>8 = 130
    val w = 4; val h = 2
    val f = Array.fill[Byte](w * h)(128.toByte) ++
      Array.fill[Byte](w * h / 2)(128.toByte)
    val v = Y4m.Video(w, h, 25, 1, subsampled = true, Vector(f))
    val img = Y4m.frameToRgb(v, 0).get
    assert(img.width === w && img.height === h)
    assert(img.pixels.forall(p => (p & 0xff) === 130))
    // black (Y=16) → 0; white (Y=235) → 255
    val black = f.clone(); java.util.Arrays.fill(black, 0, w * h, 16.toByte)
    val vb = v.copy(frames = Vector(black))
    assert(Y4m.frameToRgb(vb, 0).get.pixels.forall(p => (p & 0xff) === 0))
    val white = f.clone(); java.util.Arrays.fill(white, 0, w * h, 235.toByte)
    val vw = v.copy(frames = Vector(white))
    assert(Y4m.frameToRgb(vw, 0).get.pixels.forall(p => (p & 0xff) === 255))
    assert(Y4m.frameToRgb(v, 5) === None)
  }

  test("sampleIndices: everyMs spacing, dedup, always nonempty") {
    val v = vid(nFrames = 10, fn = 10, fd = 1) // 10 fps → 1000 ms total
    assert(Y4m.sampleIndices(v, 300L) === Seq(0, 3, 6, 9))
    assert(Y4m.sampleIndices(v, 2000L) === Seq(0))
    // sub-frame spacing dedups to each frame once
    assert(Y4m.sampleIndices(v, 50L) === (0 until 10))
    assert(Y4m.sampleIndices(v.copy(frames = Vector.empty), 100L) === Seq.empty)
  }

  test("sampleVideoFrames: distributed decode, luma values, bad payloads drop") {
    val v = vid(nFrames = 4, fn = 4, fd = 1) // 4 fps → 1000 ms
    val rows = Seq(
      (1L, Y4m.encode(v)),
      (2L, "not video".getBytes))
    val df = spark.createDataFrame(rows).toDF("media_id", "payload")
    val out = Multimodal.sampleVideoFrames(df, 500L).collect()
    assert(out.forall(_.media_id === 1L))
    assert(out.map(_.frame_idx).sorted.toSeq === Seq(0, 2))
    assert(out.find(_.frame_idx == 0).get.frame_ms === 0L)
    assert(out.find(_.frame_idx == 2).get.frame_ms === 500L)
    val expected0 = Y4m.meanLuma256(v, 0)
    assert(out.find(_.frame_idx == 0).get.mean_luma256 === expected0)
  }

  test("videoStats: driver-evidence batch emits sampled frames for all clips") {
    val rows = Multimodal.videoStats(spark, n = 8, everyMs = 500L).collect()
    val ids = rows.map(_.getAs[Long]("media_id")).distinct.sorted
    assert(ids.toSeq === (0L until 8L))
    // id 0: w=8,h=6,3 frames @4fps → 750 ms → samples at 0,500 → idx 0,2
    val r0 = rows.filter(_.getAs[Long]("media_id") == 0L)
    assert(r0.map(_.getAs[Int]("frame_idx")).sorted.toSeq === Seq(0, 2))
    assert(r0.forall(_.getAs[Int]("width") === 8))
    // pin one luma value against the generator formula
    val f0 = Array.tabulate[Byte](8 * 6 * 3 / 2)(i => ((i * 7) % 256).toByte)
    val v0 = Y4m.Video(8, 6, 4, 1, subsampled = true, Vector(f0))
    assert(r0.find(_.getAs[Int]("frame_idx") == 0).get
      .getAs[Long]("mean_luma256") === Y4m.meanLuma256(v0, 0))
  }
}
