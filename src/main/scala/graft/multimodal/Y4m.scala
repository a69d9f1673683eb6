package graft.multimodal

/** Pure-JVM parser for YUV4MPEG2 (.y4m) video — the uncompressed planar
  * interchange format the reference toolchains emit (`ffmpeg -i in.mp4
  * out.y4m`). Needs no native library, so the multimodal pipeline gets a
  * REAL frame-sampling video kernel end-to-end; inter-coded containers
  * (H.264/VP9/AV1 in mp4/webm) genuinely need native decoders and stay
  * behind the pluggable kernel seam in Multimodal.
  *
  * Format (mjpegtools spec): one ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<num>:<den> [I<t>] [A<n>:<d>] [C<tag>] [X...]\n`
  * then per frame `FRAME[ params]\n` followed by the raw planar frame:
  * Y plane (w×h), U and V planes (w/2×h/2 for C420 variants, w×h for
  * C444). We accept C420, C420jpeg, C420mpeg2, C420paldv (all share the
  * 4:2:0 plane layout — only chroma siting differs, irrelevant to
  * feature kernels) and C444; default when absent is C420 per spec.
  *
  * Malformed-input contract mirrors Wav/Png/Jpeg: None for wrong magic,
  * missing/invalid W/H/F, odd 4:2:0 dimensions, unsupported chroma tags,
  * or a FRAME header whose payload the remaining bytes cannot cover —
  * all checked BEFORE any frame buffer is allocated, so a forged header
  * cannot force a multi-GB allocation.
  */
object Y4m {

  /** Decoded stream: frames are raw planar YUV in the stream's chroma
    * layout (`subsampled` ⇒ 4:2:0, frame size w*h*3/2; else 4:4:4). */
  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      subsampled: Boolean, frames: Vector[Array[Byte]]) {
    def frameBytes: Int =
      if (subsampled) width * height * 3 / 2 else width * height * 3
    def durationMs: Long =
      if (fpsNum <= 0) 0L
      else frames.size.toLong * 1000L * fpsDen / fpsNum
  }

  private val Magic = "YUV4MPEG2"

  /** Parse a .y4m payload; None for anything malformed. `maxFrames`
    * bounds decode work for kernels that only need a prefix (frame
    * sampling seeks from the front anyway — y4m has no index). */
  def decode(bytes: Array[Byte], maxFrames: Int = Int.MaxValue)
      : Option[Video] = {
    if (bytes == null || bytes.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic.charAt(i)) return None
      i += 1
    }
    var nl = i
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    if (nl >= bytes.length || nl - i > 512) return None // unterminated header
    val header = new String(bytes, i, nl - i,
      java.nio.charset.StandardCharsets.US_ASCII)

    var w = -1; var h = -1; var fn = -1; var fd = -1
    var chroma = "420"
    val toks = header.split(' ').filter(_.nonEmpty)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      val body = tok.substring(1)
      tok.charAt(0) match {
        case 'W' => w = body.toIntOption.getOrElse(-1)
        case 'H' => h = body.toIntOption.getOrElse(-1)
        case 'F' =>
          val parts = body.split(':')
          if (parts.length == 2) {
            fn = parts(0).toIntOption.getOrElse(-1)
            fd = parts(1).toIntOption.getOrElse(-1)
          }
        case 'C' => chroma = body
        case 'I' | 'A' | 'X' => () // interlacing/aspect/extensions: ignored
        case _ => return None
      }
      t += 1
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    if (w.toLong * h * 3 > Int.MaxValue - 64) return None
    val subsampled = chroma match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" => true
      case "444" => false
      case _ => return None // 422/411/mono/alpha: unsupported
    }
    if (subsampled && ((w & 1) == 1 || (h & 1) == 1)) return None
    val frameBytes = if (subsampled) w * h * 3 / 2 else w * h * 3

    val frames = Vector.newBuilder[Array[Byte]]
    var n = 0
    var pos = nl + 1
    while (pos < bytes.length && n < maxFrames) {
      // expect "FRAME" + optional params up to '\n'
      if (pos + 5 > bytes.length) return None
      var j = 0
      while (j < 5) {
        if (bytes(pos + j) != "FRAME".charAt(j)) return None
        j += 1
      }
      var fnl = pos + 5
      while (fnl < bytes.length && bytes(fnl) != '\n') fnl += 1
      if (fnl >= bytes.length || fnl - pos > 256) return None
      val body = fnl + 1
      if (body + frameBytes > bytes.length) return None // truncated frame
      frames += java.util.Arrays.copyOfRange(bytes, body, body + frameBytes)
      n += 1
      pos = body + frameBytes
    }
    if (n == 0 && pos < bytes.length) return None
    Some(Video(w, h, fn, fd, subsampled, frames.result()))
  }

  /** Canonical encoding (stream header + bare FRAME markers) — exact
    * round-trips for specs and the driver-evidence query. */
  def encode(v: Video): Array[Byte] = {
    val header =
      s"$Magic W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 " +
        s"C${if (v.subsampled) "420" else "444"}\n"
    val hb = header.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val fb = v.frameBytes
    require(v.frames.forall(_.length == fb),
      s"frame buffers must be $fb bytes")
    val out = new Array[Byte](hb.length + v.frames.size * (6 + fb))
    System.arraycopy(hb, 0, out, 0, hb.length)
    var pos = hb.length
    for (f <- v.frames) {
      out(pos) = 'F'; out(pos + 1) = 'R'; out(pos + 2) = 'A'
      out(pos + 3) = 'M'; out(pos + 4) = 'E'; out(pos + 5) = '\n'
      System.arraycopy(f, 0, out, pos + 6, fb)
      pos += 6 + fb
    }
    out
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Convert one frame to packed RGB (BT.601 limited range, the y4m
    * default) — the bridge into the image kernels (resize, featurize,
    * Ppm/Png/Jpeg re-encode). */
  def frameToRgb(v: Video, idx: Int): Option[Ppm.Image] = {
    if (idx < 0 || idx >= v.frames.size) return None
    val f = v.frames(idx)
    val w = v.width; val h = v.height
    val out = new Array[Byte](w * h * 3)
    val cw = if (v.subsampled) w / 2 else w
    val uOff = w * h
    val vOff = uOff + cw * (if (v.subsampled) h / 2 else h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = f(y * w + x) & 0xff
        val ci = if (v.subsampled) (y / 2) * cw + x / 2 else y * cw + x
        val cb = (f(uOff + ci) & 0xff) - 128
        val cr = (f(vOff + ci) & 0xff) - 128
        val c = 298 * ((yy - 16) max 0)
        val p = (y * w + x) * 3
        out(p) = clamp((c + 409 * cr + 128) >> 8).toByte
        out(p + 1) = clamp((c - 100 * cb - 208 * cr + 128) >> 8).toByte
        out(p + 2) = clamp((c + 516 * cb + 128) >> 8).toByte
        x += 1
      }
      y += 1
    }
    Some(Ppm.Image(w, h, out))
  }

  /** Frame indices at `everyMs`-spaced timestamps — the real counterpart
    * of Multimodal.sampleFrames' sequence(): timestamp t maps to frame
    * floor(t * fps / 1000), deduplicated, always at least frame 0. */
  def sampleIndices(v: Video, everyMs: Long): Seq[Int] = {
    require(everyMs > 0, s"everyMs must be positive: $everyMs")
    if (v.frames.isEmpty) return Seq.empty
    // frame-wise derivation of the time grid t = 0, everyMs, … < dur —
    // materializing the grid itself is unbounded under a forged header
    // (tiny fps ⇒ astronomic duration with 3 frames), while the answer
    // has at most one entry per REAL frame. For each frame the only
    // candidate is the first grid point at or after its start time.
    val dur = math.max(1L, v.durationMs)
    val picked = (0 until v.frames.size).filter { f =>
      val start = (f.toLong * 1000L * v.fpsDen + v.fpsNum - 1) / v.fpsNum
      val t = ((start + everyMs - 1) / everyMs) * everyMs
      t < dur && (t * v.fpsNum) / (1000L * v.fpsDen) == f
    }
    if (picked.isEmpty) Seq(0) else picked
  }

  /** Mean luma of one frame ×256 as an integer (so driver reruns
    * bit-match) — the cheap per-frame signal for shot detection. */
  def meanLuma256(v: Video, idx: Int): Long = {
    val f = v.frames(idx)
    val n = v.width * v.height
    var acc = 0L
    var i = 0
    while (i < n) { acc += f(i) & 0xff; i += 1 }
    acc * 256 / n
  }
}
