package graft.multimodal

import graft.SparkSpec

/** Baseline JPEG codec: encode→decode round-trips (RGB and grayscale,
  * lossy within pinned error bounds), corruption/unsupported-feature
  * rejection including forged-dimension allocation guards, and the
  * distributed resize path re-encoding JPEG as JPEG. */
class JpegSpec extends SparkSpec {

  /** Smooth gradient — low-frequency content the DCT represents well. */
  private def gradient(w: Int, h: Int): Ppm.Image = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      px(i) = (x * 255 / math.max(1, w - 1)).toByte
      px(i + 1) = (y * 255 / math.max(1, h - 1)).toByte
      px(i + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    Ppm.Image(w, h, px)
  }

  /** Deterministic pseudorandom pixels — high-frequency stress. */
  private def noisy(w: Int, h: Int): Ppm.Image = {
    val px = new Array[Byte](w * h * 3)
    for (i <- px.indices) px(i) = ((i * 2654435761L >>> 13) % 256).toByte
    Ppm.Image(w, h, px)
  }

  private def maxErr(a: Ppm.Image, b: Ppm.Image): Int =
    a.pixels.zip(b.pixels).map { case (x, y) =>
      math.abs((x & 0xff) - (y & 0xff)) }.max

  private def meanErr(a: Ppm.Image, b: Ppm.Image): Double =
    a.pixels.zip(b.pixels).map { case (x, y) =>
      math.abs((x & 0xff) - (y & 0xff)) }.sum.toDouble / a.pixels.length

  test("encode/decode round-trips a gradient within tight error bounds") {
    val img = gradient(17, 11) // non-multiple-of-8 dims: edge padding path
    val decoded = Jpeg.decode(Jpeg.encode(img))
    assert(decoded.isDefined)
    val d = decoded.get
    assert(d.width === 17 && d.height === 11)
    assert(maxErr(img, d) <= 12, s"max err ${maxErr(img, d)}")
    assert(meanErr(img, d) <= 3.0, s"mean err ${meanErr(img, d)}")
  }

  test("high-frequency content round-trips at q=1 within bounds") {
    val img = noisy(16, 16)
    val d = Jpeg.decode(Jpeg.encode(img, q = 1)).get
    assert(d.width === 16 && d.height === 16)
    // q=1 leaves only DCT rounding + the chroma transform round-trip
    assert(maxErr(img, d) <= 16, s"max err ${maxErr(img, d)}")
    assert(meanErr(img, d) <= 4.0, s"mean err ${meanErr(img, d)}")
  }

  test("4:2:0 chroma subsampling round-trips within bounds") {
    val img = gradient(20, 14) // non-multiple-of-16: padded MCU path
    val d = Jpeg.decode(Jpeg.encode420(img)).get
    assert(d.width === 20 && d.height === 14)
    // chroma is box-averaged 2x2 then replicated back — smooth content
    // stays close; the luma channel is untouched by subsampling
    assert(maxErr(img, d) <= 24, s"max err ${maxErr(img, d)}")
    assert(meanErr(img, d) <= 6.0, s"mean err ${meanErr(img, d)}")
  }

  test("restart intervals decode to the identical pixels") {
    val img = noisy(24, 16)
    val plain = Jpeg.decode(Jpeg.encode(img)).get
    val restarted = Jpeg.decode(Jpeg.encode(img, restartInterval = 2)).get
    // RST markers + DC-predictor resets are lossless bookkeeping: the
    // decoded rasters must match bit for bit
    assert(restarted.pixels.toSeq === plain.pixels.toSeq)
    val r420 = Jpeg.decode(Jpeg.encode420(img, restartInterval = 1)).get
    assert(r420.pixels.toSeq ===
      Jpeg.decode(Jpeg.encode420(img)).get.pixels.toSeq)
  }

  test("grayscale (1-component) decodes and expands to packed RGB") {
    val w = 12; val h = 9
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = ((x * 21 + y * 13) % 256).toByte
    val img = Ppm.Image(w, h, px)
    val d = Jpeg.decode(Jpeg.encodeGray(img)).get
    assert(d.width === w && d.height === h)
    // gray output: all three channels equal
    assert(d.pixels.grouped(3).forall(p => p(0) == p(1) && p(1) == p(2)))
    // and close to the source luminance
    val lumErr = (0 until w * h).map { i =>
      val r = px(i * 3) & 0xff; val g = px(i * 3 + 1) & 0xff
      val b = px(i * 3 + 2) & 0xff
      val lum = (0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt
      math.abs(lum - (d.pixels(i * 3) & 0xff))
    }.max
    assert(lumErr <= 10, s"luminance err $lumErr")
  }

  test("malformed and unsupported inputs are rejected, not thrown") {
    val good = Jpeg.encode(gradient(10, 10))
    assert(Jpeg.decode(null) === None)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)) === None)
    assert(Jpeg.decode(Ppm.encode(gradient(4, 4))) === None)
    assert(Jpeg.decode(Png.encode(gradient(4, 4))) === None)
    // truncated mid-stream
    assert(Jpeg.decode(good.take(good.length / 2)) === None)
    // progressive (SOF2) is outside the baseline: flip the SOF0 marker
    val sof = good.indices.indexWhere(i =>
      (good(i) & 0xff) == 0xff && i + 1 < good.length &&
        (good(i + 1) & 0xff) == 0xc0)
    assert(sof > 0)
    val progressive = good.clone(); progressive(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(progressive) === None)
  }

  test("header-claimed dimensions beyond the entropy payload are rejected") {
    // forge SOF0 dims to 2000x2000: total blocks need far more entropy
    // bytes than the tiny real scan carries — the allocation guard must
    // reject BEFORE sizing the component planes
    val good = Jpeg.encode(gradient(8, 8))
    val sof = good.indices.indexWhere(i =>
      (good(i) & 0xff) == 0xff && i + 1 < good.length &&
        (good(i + 1) & 0xff) == 0xc0)
    val forged = good.clone()
    val d = 2000
    forged(sof + 5) = (d >> 8).toByte; forged(sof + 6) = d.toByte // height
    forged(sof + 7) = (d >> 8).toByte; forged(sof + 8) = d.toByte // width
    assert(Jpeg.decode(forged) === None)
  }

  test("decodeImage seam tags JPEG payloads and resizeImages re-encodes " +
      "JPEG as JPEG") {
    val spark2 = spark
    import spark2.implicits._
    val big = Jpeg.encode(gradient(16, 8))
    assert(Multimodal.decodeImage(big).map(_._2) === Some("jpg"))
    val df = Seq((1L, big)).toDF("media_id", "payload")
    val out = Multimodal.resizeImages(df, maxSide = 4).collect().head
    assert(out.out_width === 4 && out.out_height === 2)
    val resized = Jpeg.decode(out.payload)
    assert(resized.isDefined && resized.get.width === 4 &&
      resized.get.height === 2)
  }

  test("jpegStats decodes every generated payload within the error bound") {
    val out = Multimodal.jpegStats(spark, n = 16).collect()
    assert(out.length === 16)
    assert(out.forall(_.getBoolean(4)), "a generated JPEG failed to decode")
    // smooth gradients through q=2: round-trip error stays tight
    assert(out.forall(_.getInt(3) <= 16),
      s"max err ${out.map(_.getInt(3)).max}")
    // dims follow the generator formula
    assert(out.forall(r =>
      r.getInt(1) == 8 + (r.getLong(0) % 11).toInt &&
        r.getInt(2) == 8 + (r.getLong(0) % 5).toInt))
  }

  test("meta parses container structure without entropy decode") {
    // plain 4:4:4, no restarts
    val m1 = Jpeg.meta(Jpeg.encode(gradient(17, 11))).get
    assert((m1.width, m1.height, m1.nComponents, m1.precision) === (17, 11, 3, 8))
    assert((m1.lumaH, m1.lumaV, m1.restartInterval, m1.nRst) === (1, 1, 0, 0))
    assert((m1.nDqt, m1.nDht, m1.hasEoi) === (1, 2, true))
    // 4:2:0 + restart interval: nMCU = ceil(33/16)*ceil(21/16) = 3*2 = 6,
    // RST before every mcu>0 with mcu%2==0 → floor((6-1)/2) = 2
    val m2 = Jpeg.meta(Jpeg.encode420(gradient(33, 21), restartInterval = 2)).get
    assert((m2.lumaH, m2.lumaV) === (2, 2))
    assert(m2.restartInterval === 2)
    assert(m2.nRst === 2)
    // grayscale: 1 component
    val m3 = Jpeg.meta(Jpeg.encodeGray(gradient(9, 9))).get
    assert((m3.nComponents, m3.lumaH, m3.lumaV) === (1, 1, 1))
    // malformed payloads are rejected, not thrown
    assert(Jpeg.meta(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Jpeg.meta(Jpeg.encode(gradient(8, 8)).dropRight(2)).isEmpty) // no EOI
  }

  test("jpegMeta fields follow the generator formulas for every row") {
    val out = Multimodal.jpegMeta(spark, n = 16).collect()
    assert(out.length === 16)
    for (r <- out) {
      val id = r.getLong(0)
      val f = if (id % 2 == 1) 2 else 1
      val w = 8 + (id % 11).toInt
      val h = 8 + (id % 5).toInt
      val ri = (id % 4).toInt
      val nmcu = ((w + 8 * f - 1) / (8 * f)) * ((h + 8 * f - 1) / (8 * f))
      assert(r.getInt(1) === w)
      assert(r.getInt(2) === h)
      assert(r.getInt(3) === 3)
      assert(r.getInt(4) === 8)
      assert(r.getInt(5) === f)
      assert(r.getInt(6) === f)
      assert(r.getInt(7) === ri)
      assert((r.getInt(8), r.getInt(9)) === ((1, 2)))
      assert(r.getInt(10) === (if (ri > 0) (nmcu - 1) / ri else 0), s"id=$id")
      assert(r.getBoolean(11))
    }
  }

  test("featureKernel computes real features for JPEG payloads") {
    val img = gradient(8, 6)
    val feats = Ppm.featureKernel()(Seq(Jpeg.encode(img)))
    assert(feats.head(0) === 8.0f && feats.head(1) === 6.0f)
  }
}
