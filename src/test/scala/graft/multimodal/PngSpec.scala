package graft.multimodal

import java.util.zip.{CRC32, Deflater}

import graft.SparkSpec

/** PNG codec: encode→decode round-trip, every scanline filter and color
  * type via hand-constructed fixtures (the encoder only emits filter 0,
  * so filters 1-4 are exercised by forward-filtering known pixels and
  * asserting the decoder reconstructs them), corruption rejection, and
  * the distributed resize path re-encoding PNG as PNG. */
class PngSpec extends SparkSpec {

  private def testImage(w: Int, h: Int): Ppm.Image = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      px(i) = ((x * 37 + y * 101) % 256).toByte
      px(i + 1) = ((x * 7 + y * 13 + 128) % 256).toByte
      px(i + 2) = ((x * x + y) % 256).toByte
    }
    Ppm.Image(w, h, px)
  }

  // -- raw PNG builder for arbitrary color types / per-row filters --

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = data.length
    out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4); out.write(data, 0, len)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    val c = crc.getValue
    out.write((c >>> 24).toInt); out.write((c >>> 16).toInt)
    out.write((c >>> 8).toInt); out.write(c.toInt)
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(); d.setInput(raw); d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end(); buf.toByteArray
  }

  /** Assemble a PNG from per-row SAMPLE bytes (channels interleaved),
    * forward-filtering each row with the requested filter type. */
  private def buildPng(w: Int, h: Int, colorType: Int, channels: Int,
      samples: Array[Byte], rowFilters: Seq[Int],
      palette: Option[Array[Byte]] = None): Array[Byte] = {
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = rowFilters(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = samples(y * stride + x) & 0xff
        val left = if (x >= channels) samples(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) samples((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels) samples((y - 1) * stride + x - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val ihdr = new Array[Byte](13)
    def p32(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = (v >>> 24).toByte; a(p + 1) = (v >>> 16).toByte
      a(p + 2) = (v >>> 8).toByte; a(p + 3) = v.toByte
    }
    p32(ihdr, 0, w); p32(ihdr, 4, h); ihdr(8) = 8; ihdr(9) = colorType.toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'), 0, 8)
    out.write(chunk("IHDR", ihdr))
    palette.foreach(p => out.write(chunk("PLTE", p)))
    out.write(chunk("IDAT", deflate(raw)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("encode/decode round-trips RGB pixels exactly") {
    val img = testImage(13, 7)
    val decoded = Png.decode(Png.encode(img))
    assert(decoded.isDefined)
    assert(decoded.get.width === 13 && decoded.get.height === 7)
    assert(decoded.get.pixels.toSeq === img.pixels.toSeq)
  }

  test("all five scanline filters reconstruct exactly (truecolor)") {
    val img = testImage(9, 5)
    val png = buildPng(9, 5, colorType = 2, channels = 3, img.pixels,
      rowFilters = Seq(0, 1, 2, 3, 4))
    val decoded = Png.decode(png)
    assert(decoded.isDefined)
    assert(decoded.get.pixels.toSeq === img.pixels.toSeq)
  }

  test("grayscale (0), gray+alpha (4), RGBA (6) expand to packed RGB") {
    val (w, h) = (4, 3)
    val gray = Array.tabulate[Byte](w * h)(i => (i * 19 % 256).toByte)
    val expectGray = gray.flatMap(g => Seq(g, g, g)).toSeq

    val g0 = Png.decode(buildPng(w, h, 0, 1, gray, Seq(0, 1, 4)))
    assert(g0.map(_.pixels.toSeq) === Some(expectGray))

    val ga = Array.tabulate[Byte](w * h * 2)(i =>
      if (i % 2 == 0) gray(i / 2) else 0x80.toByte)
    val g4 = Png.decode(buildPng(w, h, 4, 2, ga, Seq(2, 3, 1)))
    assert(g4.map(_.pixels.toSeq) === Some(expectGray))

    val rgb = testImage(w, h)
    val rgba = Array.tabulate[Byte](w * h * 4)(i =>
      if (i % 4 == 3) 0xff.toByte else rgb.pixels(i / 4 * 3 + i % 4))
    val g6 = Png.decode(buildPng(w, h, 6, 4, rgba, Seq(4, 2, 3)))
    assert(g6.map(_.pixels.toSeq) === Some(rgb.pixels.toSeq))
  }

  test("palette (3) resolves indices through PLTE") {
    val pal = Array.tabulate[Byte](9)(i => (i * 25).toByte) // 3 entries
    val idx = Array[Byte](0, 1, 2, 2, 1, 0)
    val png = buildPng(3, 2, 3, 1, idx, Seq(0, 1), palette = Some(pal))
    val decoded = Png.decode(png)
    val expect = idx.flatMap(i => pal.slice((i & 0xff) * 3, (i & 0xff) * 3 + 3)).toSeq
    assert(decoded.map(_.pixels.toSeq) === Some(expect))
  }

  test("malformed inputs are rejected, not thrown") {
    val good = Png.encode(testImage(5, 5))
    assert(Png.decode(null) === None)
    assert(Png.decode(Array[Byte](1, 2, 3)) === None)
    // flip one byte inside IDAT: CRC must catch it
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    assert(Png.decode(corrupt) === None)
    // truncated stream
    assert(Png.decode(good.take(good.length - 12)) === None)
    // 16-bit depth out of supported baseline
    val deep = good.clone(); deep(8 + 8 + 8) = 16
    assert(Png.decode(deep) === None)   // (CRC now wrong too — either gate rejects)
    // PPM bytes are not PNG
    assert(Png.decode(Ppm.encode(testImage(2, 2))) === None)
    // forged wide-and-flat RGBA header: w*h*3 passes the IHDR gate but
    // w*channels would overflow Int — must reject, not throw
    val ihdr = new Array[Byte](13)
    val w = 700000000
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(7) = 1 // height 1
    ihdr(8) = 8; ihdr(9) = 6 // RGBA
    val forged = new java.io.ByteArrayOutputStream()
    forged.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'), 0, 8)
    forged.write(chunk("IHDR", ihdr))
    forged.write(chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3))))
    forged.write(chunk("IEND", Array.emptyByteArray))
    assert(Png.decode(forged.toByteArray) === None)
  }

  test("interlaced and bad-palette images are rejected, not thrown") {
    // Adam7 interlace is outside the supported baseline
    val img = testImage(4, 4)
    val plain = Png.encode(img)
    val interlaced = plain.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR interlace byte (CRC now wrong too)
    assert(Png.decode(interlaced) === None)
    // palette index beyond PLTE length must reject during expansion
    val shortPal = Array.tabulate[Byte](3)(i => (i * 10).toByte) // 1 entry
    val idx = Array[Byte](0, 2) // index 2 has no palette entry
    assert(Png.decode(buildPng(2, 1, 3, 1, idx, Seq(0),
      palette = Some(shortPal))) === None)
  }

  test("FDICT (preset-dictionary) zlib stream is rejected, not an infinite loop") {
    // zlib header 0x78 0x20: CMF=0x78, FLG has FDICT set and passes the
    // %31 check (30720+32 = 30752 = 31*992). Inflater stalls with
    // needsDictionary() — inflate returns 0 forever — so the decoder must
    // treat the stall as malformed instead of spinning.
    val idat = Array[Byte](0x78, 0x20, 0, 0, 0, 1) // header + dict id
    val ihdr = new Array[Byte](13)
    ihdr(3) = 2; ihdr(7) = 2; ihdr(8) = 8; ihdr(9) = 2 // 2x2 RGB
    val png = new java.io.ByteArrayOutputStream()
    png.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'), 0, 8)
    png.write(chunk("IHDR", ihdr))
    png.write(chunk("IDAT", idat))
    png.write(chunk("IEND", Array.emptyByteArray))
    assert(Png.decode(png.toByteArray) === None)
  }

  test("header-claimed dimensions far beyond the IDAT payload are rejected") {
    // 20000x20000 gray passes the IHDR w*h*3 gate, but the raw scanline
    // buffer it claims (~400 MB) exceeds any legal zlib expansion of the
    // ~12-byte IDAT — must reject BEFORE allocating, like Ppm.decode
    val ihdr = new Array[Byte](13)
    val d = 20000
    ihdr(2) = (d >>> 8).toByte; ihdr(3) = d.toByte
    ihdr(6) = (d >>> 8).toByte; ihdr(7) = d.toByte
    ihdr(8) = 8; ihdr(9) = 0 // 8-bit gray
    val png = new java.io.ByteArrayOutputStream()
    png.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'), 0, 8)
    png.write(chunk("IHDR", ihdr))
    png.write(chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3))))
    png.write(chunk("IEND", Array.emptyByteArray))
    assert(Png.decode(png.toByteArray) === None)
  }

  test("featureKernel computes real features for PNG payloads") {
    val img = testImage(8, 6)
    val Seq(fromPng, fromPpm) =
      Ppm.featureKernel()(Seq(Png.encode(img), Ppm.encode(img)))
    assert(fromPng.toSeq === fromPpm.toSeq) // same pixels → same features
    assert(fromPng(0) === 8.0f && fromPng(1) === 6.0f)
  }

  test("pngStats decodes every generated payload and matches the " +
      "generator formula exactly") {
    val out = Multimodal.pngStats(spark, n = 16).collect()
    assert(out.length === 16)
    assert(out.forall(_.getBoolean(6)), "a generated PNG failed to decode")
    // recompute id=5's stats straight from the generator formula — the
    // codec must round-trip these exact bytes
    val id = 5L
    val w = 4 + (id % 13).toInt
    val h = 3 + (id % 7).toInt
    val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 31 + id * 17) % 256).toByte)
    val sums = px.grouped(3).foldLeft((0L, 0L, 0L)) { case ((r, g, b), p) =>
      (r + (p(0) & 0xff), g + (p(1) & 0xff), b + (p(2) & 0xff))
    }
    val row = out.find(_.getLong(0) == id).get
    assert(row.getInt(1) === w && row.getInt(2) === h)
    assert((row.getLong(3), row.getLong(4), row.getLong(5)) === sums)
  }

  test("resizeImages: PNG payloads resize and re-encode as PNG") {
    val spark2 = spark
    import spark2.implicits._
    val big = Png.encode(testImage(16, 8))
    val small = Png.encode(testImage(3, 2))
    val notImage = Array[Byte](9, 9, 9)
    val df = Seq((1L, big), (2L, small), (3L, notImage))
      .toDF("media_id", "payload")
    val out = Multimodal.resizeImages(df, maxSide = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(1L).out_width === 4 && out(1L).out_height === 2)
    val resized = Png.decode(out(1L).payload)
    assert(resized.isDefined && resized.get.width === 4 && resized.get.height === 2)
    assert(resized.get.pixels.toSeq ===
      Ppm.resizeNearest(testImage(16, 8), 4, 2).pixels.toSeq)
    assert(out(2L).out_width === 3 && out(2L).payload.toSeq === small.toSeq)
    assert(out(3L).out_width === -1 && out(3L).payload.toSeq === notImage.toSeq)
  }
}
