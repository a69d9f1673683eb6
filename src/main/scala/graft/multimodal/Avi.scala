package graft.multimodal

/** Pure-JVM parser/writer for AVI containers carrying MJPEG video — a
  * real COMPRESSED video path: each frame is a baseline JPEG decoded by
  * the in-repo Jpeg codec (own Huffman + IDCT), so the pipeline handles
  * compressed video end-to-end with no native library. Inter-frame
  * codecs (H.264/VP9) genuinely need native decoders and stay behind the
  * pluggable kernel seam in Multimodal.
  *
  * Container (RIFF, the same chunk grammar as Wav): `RIFF <size> 'AVI '`,
  * a `LIST hdrl` with the `avih` main header (µs/frame, frame count,
  * dimensions) and a `LIST strl` whose `strh` declares a 'vids' stream
  * with handler 'MJPG' (fps = dwRate/dwScale), then a `LIST movi` whose
  * '00dc'/'00db' chunks each hold one complete JPEG. The optional idx1
  * index is ignored — chunks are walked directly.
  *
  * Malformed-input contract mirrors Wav/Png/Jpeg: None instead of throw
  * or over-allocation — wrong magic, size lies, non-MJPG streams,
  * header/chunk frame-count mismatch, and absurd dimensions are rejected
  * before any frame buffer is allocated. Frames stay ENCODED in the
  * parsed value (a frame is only decompressed when sampled — decoding
  * everything eagerly would defeat frame sampling's point at scale);
  * per-frame dimension consistency is enforced at frame decode.
  */
object Avi {

  /** Parsed clip: encoded JPEG frames + stream timing. */
  final case class Mjpeg(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Vector[Array[Byte]]) {
    require(fpsNum > 0 && fpsDen > 0, s"bad fps $fpsNum/$fpsDen")
    def durationMs: Long = frames.length.toLong * 1000L * fpsDen / fpsNum
  }

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a frame to packed RGB, rejecting dimension lies: the JPEG's
    * own dimensions must match the container header's. */
  def decodeFrame(m: Mjpeg, idx: Int): Option[Ppm.Image] =
    if (idx < 0 || idx >= m.frames.length) None
    else Jpeg.decode(m.frames(idx))
      .filter(img => img.width == m.width && img.height == m.height)

  /** Frame indices sampled every `everyMs`: the frames a time grid
    * t = 0, everyMs, … ≤ durationMs lands on (frame k plays at
    * k·1000·fpsDen/fpsNum ms). Derived FRAME-wise, not by materializing
    * the time grid — a forged-but-parseable header (tiny fps, huge
    * duration, 3 frames) would make the grid astronomically long while
    * the answer is still at most one entry per frame. For each frame,
    * the only grid point that can map to it is the first one at or
    * after the frame's start time; all integer arithmetic, identical
    * to the grid formulation. */
  def sampleIndices(m: Mjpeg, everyMs: Long): Seq[Int] = {
    require(everyMs > 0, s"everyMs must be positive: $everyMs")
    val dur = m.durationMs
    (0 until m.frames.length).filter { f =>
      val start = (f.toLong * 1000L * m.fpsDen + m.fpsNum - 1) / m.fpsNum
      val t = ((start + everyMs - 1) / everyMs) * everyMs // first grid pt
      t <= dur && (t * m.fpsNum) / (1000L * m.fpsDen) == f
    }
  }

  /** Parse an AVI payload; None for anything malformed. */
  def decode(bytes: Array[Byte]): Option[Mjpeg] = {
    if (bytes == null || bytes.length < 24) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None

    var width = 0
    var height = 0
    var totalFrames = -1L
    var fpsNum = 0
    var fpsDen = 0
    var vidsSeen = false
    val frames = Vector.newBuilder[Array[Byte]]
    var nFrames = 0

    // Iterative chunk walk with an explicit LIST stack (the call-stack
    // recursion it replaced let a crafted payload of deeply nested LIST
    // headers — ~12 bytes per level — drive StackOverflowError past the
    // None-instead-of-throw contract; ADVICE r7). Each stack frame is the
    // enclosing LIST's (end, resumeAt): descending pushes, reaching `end`
    // pops and jumps to `resumeAt` (the next sibling AFTER the list's
    // pad byte — the recursion got that from its caller's advance). The
    // stack holds ≤ bytes.length/12 frames since each level consumes a
    // 12-byte LIST header of input, so memory stays linear and bounded.
    def walk(start: Int, limit: Int): Boolean = { // false = malformed
      var pos = start
      var end = limit
      var stack = List.empty[(Int, Int)] // (enclosing end, resume pos)
      while (pos < end || stack.nonEmpty) {
        if (pos >= end) {
          // a final odd-sized chunk's pad advance may overshoot `end` by
          // one byte — the recursion tolerated that (its loop guard just
          // exited); anything further means a size lie
          if (pos > end + 1) return false
          // loop guard ⇒ stack is non-empty whenever pos >= end here
          val (e, r) = stack.head; stack = stack.tail
          end = e; pos = r
        } else if (pos + 8 > end) {
          pos = end // <8 trailing bytes: ignorable slack, as before
        } else {
          val id = fourcc(bytes, pos)
          val size = u32(bytes, pos + 4)
          val body = pos + 8
          if (size < 0 || body + size > end) return false
          val next = body + size.toInt + (size.toInt & 1)
          id match {
            case "LIST" =>
              if (size < 4) return false
              // list type fourcc, then child chunks: push the parent's
              // (end, next-sibling) and step into the first child
              stack = (end, next) :: stack
              end = body + size.toInt
              pos = body + 4
            case other =>
              other match {
                case "avih" =>
                  if (size < 40) return false
                  totalFrames = u32(bytes, body + 16)
                  width = u32(bytes, body + 32).toInt
                  height = u32(bytes, body + 36).toInt
                case "strh" =>
                  if (size < 40) return false
                  if (fourcc(bytes, body) == "vids") {
                    if (fourcc(bytes, body + 4) != "MJPG") return false
                    val scale = u32(bytes, body + 20)
                    val rate = u32(bytes, body + 24)
                    // u32 is a Long; a value in [2^31, 2^32) would pass a
                    // positivity check and then wrap negative under toInt,
                    // turning the Mjpeg require into a throw
                    if (scale <= 0 || rate <= 0 ||
                      scale > Int.MaxValue || rate > Int.MaxValue)
                      return false
                    fpsNum = rate.toInt
                    fpsDen = scale.toInt
                    vidsSeen = true
                  }
                case "00dc" | "00db" =>
                  val f = new Array[Byte](size.toInt)
                  System.arraycopy(bytes, body, f, 0, size.toInt)
                  frames += f
                  nFrames += 1
                case _ => () // strf/idx1/JUNK/vedt: skip
              }
              pos = next
          }
        }
      }
      true
    }
    if (!walk(12, bytes.length)) return None

    if (!vidsSeen) return None
    if (width <= 0 || height <= 0 || width > 16384 || height > 16384)
      return None
    if (totalFrames != nFrames) return None // header must match the walk
    Some(Mjpeg(width, height, fpsNum, fpsDen, frames.result()))
  }

  /** Minimal AVI writer (one MJPG video stream, no idx1) — enough for
    * exact container round-trips in specs and the driver-evidence
    * query. Frames must be pre-encoded JPEGs of the declared size. */
  def encode(m: Mjpeg): Array[Byte] = {
    val paddedSizes = m.frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + paddedSizes.map(_ + 8).sum
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val total = 12 + 8 + hdrlSize + 8 + moviSize
    val out = new Array[Byte](total)
    var p = 0
    def tag(s: String): Unit = {
      var i = 0; while (i < 4) { out(p + i) = s.charAt(i).toByte; i += 1 }
      p += 4
    }
    def p32(v: Long): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte
      out(p + 3) = ((v >> 24) & 0xff).toByte
      p += 4
    }
    tag("RIFF"); p32(total - 8L); tag("AVI ")
    tag("LIST"); p32(hdrlSize.toLong); tag("hdrl")
    tag("avih"); p32(56L)
    p32(1000000L * m.fpsDen / m.fpsNum) // µs per frame
    p32(0L); p32(0L); p32(0L)
    p32(m.frames.length.toLong) // dwTotalFrames
    p32(0L); p32(1L) // initial frames, stream count
    p32(0L)
    p32(m.width.toLong); p32(m.height.toLong)
    p32(0L); p32(0L); p32(0L); p32(0L) // reserved
    tag("LIST"); p32(strlSize.toLong); tag("strl")
    tag("strh"); p32(56L)
    tag("vids"); tag("MJPG")
    p32(0L); p32(0L); p32(0L) // flags, prio/lang, initial frames
    p32(m.fpsDen.toLong); p32(m.fpsNum.toLong) // dwScale, dwRate
    p32(0L); p32(m.frames.length.toLong) // start, dwLength
    p32(0L); p32(-1L & 0xffffffffL); p32(0L) // bufsize, quality, sampleSize
    p32(0L); p32(0L) // rcFrame
    tag("strf"); p32(40L)
    p32(40L); p32(m.width.toLong); p32(m.height.toLong)
    out(p) = 1; p += 2 // planes = 1 (LE u16)
    out(p) = 24; p += 2 // bit count
    tag("MJPG") // biCompression
    p32(m.width.toLong * m.height * 3) // size image
    p32(0L); p32(0L); p32(0L); p32(0L) // ppm, colors
    tag("LIST"); p32(moviSize.toLong); tag("movi")
    m.frames.foreach { f =>
      tag("00dc"); p32(f.length.toLong)
      System.arraycopy(f, 0, out, p, f.length)
      p += f.length + (f.length & 1)
    }
    require(p == total, s"writer layout bug: $p != $total")
    out
  }
}
