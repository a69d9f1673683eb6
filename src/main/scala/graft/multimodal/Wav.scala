package graft.multimodal

/** Pure-JVM codec for RIFF/WAVE PCM audio — the uncompressed interchange
  * format every audio toolchain can emit (`ffmpeg -i in.mp3 out.wav`).
  * Needs no native library, so the multimodal pipeline gets a REAL audio
  * decode/feature kernel end-to-end; compressed codecs (MP3/AAC/Opus)
  * genuinely need native decoders and stay behind the pluggable kernel
  * seam in Multimodal.
  *
  * Format (RIFF spec): `RIFF <size> WAVE`, then chunks `<fourcc> <size>
  * <payload>` (word-aligned). We require a `fmt ` chunk with
  * audioFormat 1 (integer PCM) at 8 or 16 bits, then take samples from
  * the `data` chunk. Unknown chunks (LIST, fact, cue) are skipped — they
  * appear in real-world files.
  *
  * Malformed-input contract mirrors Png/Jpeg: decode returns None rather
  * than throwing or over-allocating — wrong magic, non-PCM formats,
  * unsupported depths, and header-claimed sizes the payload cannot cover
  * are all rejected BEFORE the sample buffer is allocated, so a forged
  * few-hundred-byte file cannot force a multi-GB allocation.
  */
object Wav {

  /** Decoded clip: interleaved 16-bit samples (8-bit input is widened),
    * `samples.length == frames * channels`. */
  final case class Audio(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    require(channels > 0 && samples.length % channels == 0,
      s"sample buffer ${samples.length} not a multiple of $channels channels")
    def frames: Int = samples.length / channels
    def durationMs: Long =
      if (sampleRate <= 0) 0L else frames.toLong * 1000L / sampleRate
  }

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE payload; None for anything malformed (wrong magic,
    * compressed formats, 24/32-bit depths, truncated chunks, size lies). */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "WAVE") return None

    var pos = 12
    var fmtSeen = false
    var audioFormat = 0
    var channels = 0
    var sampleRate = 0
    var bitsPerSample = 0

    while (pos + 8 <= bytes.length) {
      val id = fourcc(bytes, pos)
      val size = u32(bytes, pos + 4)
      val body = pos + 8
      // a chunk claiming more bytes than the payload holds is a forgery
      if (size < 0 || body + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          audioFormat = u16(bytes, body)
          channels = u16(bytes, body + 2)
          sampleRate = u32(bytes, body + 4).toInt
          bitsPerSample = u16(bytes, body + 14)
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) return None // data before fmt: malformed
          if (audioFormat != 1) return None // PCM only; no float/ADPCM/µ-law
          if (bitsPerSample != 8 && bitsPerSample != 16) return None
          if (channels < 1 || channels > 8) return None
          if (sampleRate <= 0 || sampleRate > 768000) return None
          val bytesPerSample = bitsPerSample / 8
          val n = size / bytesPerSample
          if (n > Int.MaxValue / 2 - 64) return None
          if (n % channels != 0) return None
          val out = new Array[Short](n.toInt)
          var i = 0
          if (bitsPerSample == 16) {
            while (i < out.length) {
              out(i) = u16(bytes, body + 2 * i).toShort
              i += 1
            }
          } else { // 8-bit WAV is unsigned, centered at 128 → widen
            while (i < out.length) {
              out(i) = (((bytes(body + i) & 0xff) - 128) << 8).toShort
              i += 1
            }
          }
          return Some(Audio(sampleRate, channels, out))
        case _ => () // LIST/fact/cue/bext: skip
      }
      pos = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None // no data chunk reached
  }

  /** Canonical 16-bit PCM encoding of a clip (little-endian, one fmt +
    * one data chunk) — enough for exact round-trips in specs and the
    * driver-evidence query. */
  def encode(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def put32(p: Int, v: Long): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte
      out(p + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(p: Int, v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def putTag(p: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(p + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36L + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, a.channels); put32(24, a.sampleRate.toLong)
    put32(28, a.sampleRate.toLong * a.channels * 2) // byte rate
    put16(32, a.channels * 2) // block align
    put16(34, 16)
    putTag(36, "data"); put32(40, dataSize.toLong)
    var i = 0
    while (i < a.samples.length) {
      put16(44 + 2 * i, a.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Root-mean-square amplitude over all channels (0..32768 scale). */
  def rms(a: Audio): Double = {
    if (a.samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toDouble
      acc += s * s
      i += 1
    }
    math.sqrt(acc / a.samples.length)
  }

  /** Largest absolute sample value (clipping detector). */
  def peak(a: Audio): Int = {
    var m = 0
    var i = 0
    while (i < a.samples.length) {
      val v = math.abs(a.samples(i).toInt)
      if (v > m) m = v
      i += 1
    }
    m
  }

  /** Sign changes in channel 0, an integer so driver reruns bit-match —
    * the classic speech/music/silence discriminator feature. */
  def zeroCrossings(a: Audio): Long = {
    if (a.frames < 2) return 0L
    var n = 0L
    var prev = a.samples(0) >= 0
    var f = 1
    while (f < a.frames) {
      val cur = a.samples(f * a.channels) >= 0
      if (cur != prev) n += 1
      prev = cur
      f += 1
    }
    n
  }

  /** Average all channels down to one (the cheap featurization
    * pre-step — mono models are the common case). */
  def toMono(a: Audio): Audio = {
    if (a.channels == 1) return a
    val out = new Array[Short](a.frames)
    var f = 0
    while (f < a.frames) {
      var acc = 0
      var c = 0
      while (c < a.channels) { acc += a.samples(f * a.channels + c); c += 1 }
      out(f) = (acc / a.channels).toShort
      f += 1
    }
    Audio(a.sampleRate, 1, out)
  }

  /** Nearest-frame resample to `newRate` — the decode-side normalization
    * every audio model pipeline needs (16 kHz mono is the usual target).
    * Same nearest-neighbor contract as Ppm.resizeNearest. */
  def resampleNearest(a: Audio, newRate: Int): Audio = {
    require(newRate > 0, s"newRate must be positive: $newRate")
    if (newRate == a.sampleRate) return a
    val outFrames = math.max(1,
      (a.frames.toLong * newRate / math.max(1, a.sampleRate)).toInt)
    val out = new Array[Short](outFrames * a.channels)
    var f = 0
    while (f < outFrames) {
      val src = (f.toLong * a.sampleRate / newRate).toInt min (a.frames - 1)
      var c = 0
      while (c < a.channels) {
        out(f * a.channels + c) = a.samples(src * a.channels + c)
        c += 1
      }
      f += 1
    }
    Audio(newRate, a.channels, out)
  }
}
