package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (zlib comes with the JDK — no external library),
  * closing the compressed-image gap in the multimodal pipeline: with this,
  * both PPM and PNG payloads decode FOR REAL end-to-end; only formats
  * whose codecs genuinely need native libraries (JPEG/audio/video) remain
  * behind the pluggable kernel seam in Multimodal.
  *
  * Decoder coverage (the static baseline of ISO/IEC 15948): 8-bit depth,
  * color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha) and
  * 6 (RGBA), all five scanline filters (None/Sub/Up/Average/Paeth),
  * non-interlaced. Everything else — 1/2/4/16-bit depths, Adam7 — returns
  * None (malformed-input contract identical to Ppm.decode). Alpha is
  * dropped and gray expanded so every decode lands in the same packed-RGB
  * `Ppm.Image` the rest of the kernel stack consumes.
  *
  * Encoder: 8-bit RGB, filter 0, one IDAT, correct CRCs — enough that any
  * standard tool (and this decoder) round-trips it.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Parse a PNG payload to packed RGB; None for anything malformed or
    * outside the supported baseline. */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = {
    if (bytes == null || bytes.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    var pos = Signature.length
    def u32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)

    var width, height, colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIend = false
    while (!sawIend && pos + 12 <= bytes.length) {
      val len = u32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val dataStart = pos + 8
      val dataLen = len.toInt
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + dataLen)
      if (crc.getValue != u32(dataStart + dataLen)) return None
      typ match {
        case "IHDR" =>
          if (dataLen != 13) return None
          width = u32(dataStart).toInt
          height = u32(dataStart + 4).toInt
          val bitDepth = bytes(dataStart + 8) & 0xff
          colorType = bytes(dataStart + 9) & 0xff
          val compression = bytes(dataStart + 10) & 0xff
          val filterMethod = bytes(dataStart + 11) & 0xff
          val interlace = bytes(dataStart + 12) & 0xff
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0) return None
          if (!Set(0, 2, 3, 4, 6).contains(colorType)) return None
          if (width <= 0 || height <= 0 ||
            width.toLong * height * 3 > Int.MaxValue - 64) return None
        case "PLTE" =>
          if (dataLen % 3 != 0 || dataLen > 256 * 3) return None
          palette = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + dataLen)
        case "IDAT" => idat.write(bytes, dataStart, dataLen)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunks skipped
      }
      pos += 12 + dataLen
    }
    if (!sawIend || width < 0 || idat.size == 0) return None
    if (colorType == 3 && palette == null) return None

    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // the IHDR gate bounds w*h*3, but a forged wide-and-flat header
    // (w ≈ 700M, h = 1) still overflows Int in w*channels for 4-channel
    // types — guard before any array sizing happens
    if (width.toLong * channels > Int.MaxValue - 64) return None
    val stride = width * channels
    val rawLen = (stride + 1).toLong * height
    if (rawLen > Int.MaxValue - 64) return None
    // zlib's worst-case expansion is ~1032:1 (stored blocks bound it far
    // tighter, but 1032 covers every legal stream) — a few-hundred-byte
    // forged IDAT therefore cannot legitimately claim a multi-GB raw
    // buffer, so gate the allocation on the REAL payload size, same as
    // Ppm.decode gates on actual bytes present
    if (rawLen > idat.size.toLong * 1032L + 64L) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // zero bytes out while unfinished = no forward progress possible:
        // truncated stream (needsInput), FDICT preset-dictionary stream
        // (needsDictionary), or any other stall — all malformed here
        if (n == 0 && !inflater.finished()) return None
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()

    // de-filter in place into `img` (per-scanline: filter byte + samples)
    val img = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      if (filter > 4) return None
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) img(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) img(rowOut - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) img(rowOut - stride + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 =>
            // Paeth predictor: nearest of left/up/upLeft to left+up-upLeft
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
        }
        img(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }

    // expand to packed RGB
    val rgb = new Array[Byte](width * height * 3)
    var p = 0
    var q = 0
    val n = width * height
    var k = 0
    colorType match {
      case 0 =>
        while (k < n) { val g = img(k); rgb(q) = g; rgb(q + 1) = g; rgb(q + 2) = g; q += 3; k += 1 }
      case 2 =>
        System.arraycopy(img, 0, rgb, 0, rgb.length)
      case 3 =>
        while (k < n) {
          val idx = (img(k) & 0xff) * 3
          if (idx + 2 >= palette.length) return None
          rgb(q) = palette(idx); rgb(q + 1) = palette(idx + 1); rgb(q + 2) = palette(idx + 2)
          q += 3; k += 1
        }
      case 4 =>
        while (k < n) { val g = img(p); rgb(q) = g; rgb(q + 1) = g; rgb(q + 2) = g; p += 2; q += 3; k += 1 }
      case 6 =>
        while (k < n) { rgb(q) = img(p); rgb(q + 1) = img(p + 1); rgb(q + 2) = img(p + 2); p += 4; q += 3; k += 1 }
    }
    Some(Ppm.Image(width, height, rgb))
  }

  /** Encode packed RGB as an 8-bit truecolor PNG (filter 0, one IDAT). */
  def encode(img: Ppm.Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
      val typBytes = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(typBytes, 0, 4)
      out.write(data, 0, len)
      val crc = new CRC32()
      crc.update(typBytes); crc.update(data)
      val c = crc.getValue
      out.write((c >>> 24).toInt); out.write((c >>> 16).toInt)
      out.write((c >>> 8).toInt); out.write(c.toInt)
    }
    val ihdr = new Array[Byte](13)
    def put32(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = (v >>> 24).toByte; a(p + 1) = (v >>> 16).toByte
      a(p + 2) = (v >>> 8).toByte; a(p + 3) = v.toByte
    }
    put32(ihdr, 0, img.width); put32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit, truecolor RGB
    writeChunk("IHDR", ihdr)
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // raw(y*(stride+1)) = 0: filter None
      System.arraycopy(img.pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    val compressed = try {
      deflater.setInput(raw); deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      buf.toByteArray
    } finally deflater.end()
    writeChunk("IDAT", compressed)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
