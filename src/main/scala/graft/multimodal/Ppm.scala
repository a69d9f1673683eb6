package graft.multimodal

/** Pure-JVM codec for binary PPM (P6) images — the uncompressed RGB format
  * every imaging toolchain can emit (`convert in.jpg out.ppm`). Needs no
  * native or external library, so the multimodal pipeline has one REAL
  * decode/resize/feature kernel end-to-end; compressed formats (JPEG/PNG)
  * stay behind the pluggable kernel seam in Multimodal.
  *
  * Format (netpbm spec): ASCII header `P6 <width> <height> <maxval>`,
  * tokens separated by whitespace, `#`-to-end-of-line comments allowed
  * between tokens, a single whitespace byte after maxval, then
  * width×height RGB triplets (1 byte/sample for maxval < 256 — the only
  * depth supported here).
  */
object Ppm {

  /** Decoded image: tightly packed RGB triplets, row-major. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Parse a P6 payload; None for anything malformed (wrong magic,
    * truncated raster, 2-byte samples, overflow dimensions). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 2 ||
      bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    // read the next ASCII integer token, skipping whitespace and comments
    def nextInt(): Option[Int] = {
      while (pos < bytes.length &&
        (isSpace(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9')
        pos += 1
      if (pos == start || pos - start > 9) None
      else Some(new String(bytes, start, pos - start).toInt)
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxval <- nextInt()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      if w.toLong * h * 3 <= Int.MaxValue - 64
      // exactly one whitespace byte separates maxval from the raster
      if pos < bytes.length && isSpace(bytes(pos))
      raster = pos + 1
      if bytes.length - raster >= w * h * 3
    } yield Image(w, h,
      java.util.Arrays.copyOfRange(bytes, raster, raster + w * h * 3))
  }

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Mean R/G/B in [0, 255]. */
  def meanRgb(img: Image): (Double, Double, Double) = {
    var (r, g, b) = (0L, 0L, 0L)
    var i = 0
    while (i < img.pixels.length) {
      r += img.pixels(i) & 0xff
      g += img.pixels(i + 1) & 0xff
      b += img.pixels(i + 2) & 0xff
      i += 3
    }
    val n = (img.width.toLong * img.height).toDouble
    (r / n, g / n, b / n)
  }

  /** Luminance histogram over `bins` equal ranges of [0, 256) using the
    * integer BT.601 approximation (77R + 150G + 29B) >> 8. */
  def lumaHistogram(img: Image, bins: Int): Array[Long] = {
    val hist = new Array[Long](bins)
    var i = 0
    while (i < img.pixels.length) {
      val y = (77 * (img.pixels(i) & 0xff) + 150 * (img.pixels(i + 1) & 0xff) +
        29 * (img.pixels(i + 2) & 0xff)) >> 8
      hist(y * bins / 256) += 1
      i += 3
    }
    hist
  }

  /** Nearest-neighbor resize: output pixel (x, y) samples input pixel
    * (x * w / w2, y * h / h2) — exact integer arithmetic, deterministic. */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0, s"target ${w2}x$h2")
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  /** Real image-feature kernel (Multimodal.extractFeaturesBatched
    * signature): for payloads that decode in-JVM (P6 PPM or baseline PNG —
    * Multimodal.decodeImage) — [width, height, mean R, mean G, mean B
    * (0-1 scaled), 8-bin luminance histogram (mass-normalized)], a 13-dim
    * vector; undecodable payloads go to `fallback` (the deterministic fake
    * for formats needing external codecs) in ONE call for the whole
    * undecodable slice — a per-payload fallback call would re-pay a real
    * model kernel's per-invocation overhead N times and defeat the
    * batched contract. */
  def featureKernel(fallback: Seq[Array[Byte]] => Seq[Array[Float]] =
      Multimodal.fakeKernel(13)(_))(batch: Seq[Array[Byte]]): Seq[Array[Float]] = {
    val decoded = batch.map(b => Multimodal.decodeImage(b).map(_._1))
    val undecodable = batch.zip(decoded).collect { case (b, None) => b }
    val fb = if (undecodable.nonEmpty) fallback(undecodable) else Seq.empty
    val fbIt = fb.iterator
    decoded.map {
      case Some(img) =>
        val (r, g, b) = meanRgb(img)
        val n = (img.width.toLong * img.height).toDouble
        val hist = lumaHistogram(img, 8).map(c => (c / n).toFloat)
        Array(img.width.toFloat, img.height.toFloat,
          (r / 255.0).toFloat, (g / 255.0).toFloat, (b / 255.0).toFloat) ++
          hist
      case None => fbIt.next()
    }
  }
}
