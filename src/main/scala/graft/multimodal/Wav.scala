package graft.multimodal

/** Pure-JVM codec for RIFF/WAVE audio: integer PCM (the uncompressed
  * interchange format every audio toolchain can emit — `ffmpeg -i in.mp3
  * out.wav`) plus IMA/DVI ADPCM (wFormatTag 0x11), the classic 4:1
  * COMPRESSED telephony codec — so the multimodal pipeline has a real
  * compressed-audio decode path, not just raw samples. Perceptual codecs
  * (MP3/AAC/Opus) genuinely need native decoders and stay behind the
  * pluggable kernel seam in Multimodal.
  *
  * Format (RIFF spec): `RIFF <size> WAVE`, then chunks `<fourcc> <size>
  * <payload>` (word-aligned). We require a `fmt ` chunk with audioFormat
  * 1 (integer PCM, 8/16-bit) or 0x11 (IMA ADPCM, 4-bit, block-aligned
  * with a `fact` frame count), then take samples from the `data` chunk.
  * Unknown chunks (LIST, cue) are skipped — they appear in real-world
  * files.
  *
  * Malformed-input contract mirrors Png/Jpeg: decode returns None rather
  * than throwing or over-allocating — wrong magic, unsupported formats,
  * inconsistent ADPCM block geometry, and header-claimed sizes the
  * payload cannot cover are all rejected BEFORE the sample buffer is
  * allocated, so a forged few-hundred-byte file cannot force a multi-GB
  * allocation.
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

  // IMA ADPCM quantizer tables (IMA "Recommended Practices for Enhancing
  // Digital Audio Compatibility", 1992 — the fixed tables every
  // implementation shares).
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable per-channel ADPCM state; step() is the ONE quantizer used by
    * both encode and decode, so they cannot drift apart. */
  private final class AdpcmState(var predictor: Int, var index: Int) {
    def step(nibble: Int): Int = {
      val s = StepTable(index)
      var delta = s >> 3
      if ((nibble & 1) != 0) delta += s >> 2
      if ((nibble & 2) != 0) delta += s >> 1
      if ((nibble & 4) != 0) delta += s
      predictor =
        if ((nibble & 8) != 0) math.max(-32768, predictor - delta)
        else math.min(32767, predictor + delta)
      index = math.min(88, math.max(0, index + IndexTable(nibble)))
      predictor
    }
  }

  /** Parse a RIFF/WAVE payload; None for anything malformed (wrong magic,
    * unsupported formats/depths, truncated chunks, size/geometry lies). */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "WAVE") return None

    var pos = 12
    var fmtSeen = false
    var audioFormat = 0
    var channels = 0
    var sampleRate = 0
    var bitsPerSample = 0
    var blockAlign = 0
    var samplesPerBlock = 0
    var factFrames = -1L

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
          blockAlign = u16(bytes, body + 12)
          bitsPerSample = u16(bytes, body + 14)
          if (audioFormat == 0x11) {
            // cbSize(≥2) + wSamplesPerBlock are mandatory for IMA ADPCM
            if (size < 20) return None
            samplesPerBlock = u16(bytes, body + 18)
          }
          fmtSeen = true
        case "fact" =>
          if (size < 4) return None
          factFrames = u32(bytes, body)
        case "data" =>
          if (!fmtSeen) return None // data before fmt: malformed
          if (channels < 1 || channels > 8) return None
          if (sampleRate <= 0 || sampleRate > 768000) return None
          if (audioFormat == 1) {
            if (bitsPerSample != 8 && bitsPerSample != 16) return None
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
          } else if (audioFormat == 0x11) {
            if (bitsPerSample != 4) return None
            // block geometry must be self-consistent: a 4-byte header per
            // channel, then 4-byte-per-channel nibble words covering
            // samplesPerBlock−1 further samples (the header holds the
            // first), with (spb−1) filling whole words
            if (blockAlign < 4 * channels + 4 * channels) return None
            if (samplesPerBlock < 2) return None
            if ((samplesPerBlock - 1) % 8 != 0) return None
            if (blockAlign != 4 * channels +
                (samplesPerBlock - 1) / 2 * channels) return None
            if (size % blockAlign != 0) return None
            val nBlocks = (size / blockAlign).toInt
            val maxFrames = nBlocks.toLong * samplesPerBlock
            if (factFrames < 0 || factFrames > maxFrames) return None
            if (factFrames > Int.MaxValue / 2 / channels - 64) return None
            val frames = factFrames.toInt
            val out = new Array[Short](frames * channels)
            var blk = 0
            while (blk < nBlocks) {
              val base = body + blk * blockAlign
              val frame0 = blk * samplesPerBlock
              val states = Array.tabulate(channels) { c =>
                val hp = base + 4 * c
                val pred = u16(bytes, hp).toShort.toInt
                val idx = bytes(hp + 2) & 0xff
                if (idx > 88) return None
                if (frame0 < frames)
                  out((frame0 * channels) + c) = pred.toShort
                new AdpcmState(pred, idx)
              }
              // after the headers: interleaved 4-byte words per channel,
              // each holding 8 nibbles (low nibble first)
              val dataBase = base + 4 * channels
              var word = 0
              val wordsPerChan = (samplesPerBlock - 1) / 8
              while (word < wordsPerChan) {
                var c = 0
                while (c < channels) {
                  val wp = dataBase + (word * channels + c) * 4
                  var b = 0
                  while (b < 4) {
                    val byte = bytes(wp + b) & 0xff
                    val f1 = frame0 + 1 + word * 8 + b * 2
                    val s1 = states(c).step(byte & 0xf)
                    if (f1 < frames) out(f1 * channels + c) = s1.toShort
                    val s2 = states(c).step(byte >> 4)
                    if (f1 + 1 < frames)
                      out((f1 + 1) * channels + c) = s2.toShort
                    b += 1
                  }
                  c += 1
                }
                word += 1
              }
              blk += 1
            }
            return Some(Audio(sampleRate, channels, out))
          } else return None // float/µ-law/MS-ADPCM: unsupported
        case _ => () // LIST/cue/bext: skip
      }
      pos = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None // no data chunk reached
  }

  /** IMA ADPCM encoding (wFormatTag 0x11): 4 bits per sample, the block
    * header carrying the first sample verbatim plus the step index. The
    * quantizer update is the SAME AdpcmState.step the decoder uses, so
    * encode→decode reconstruction error is exactly the quantizer's —
    * bounded by the current step size, pinned in WavSpec. `spb` is
    * samples per block ((spb−1) must fill whole 8-nibble words). */
  def encodeAdpcm(a: Audio, spb: Int = 249): Array[Byte] = {
    require(spb >= 9 && (spb - 1) % 8 == 0, s"bad samplesPerBlock $spb")
    val ch = a.channels
    val blockAlign = 4 * ch + (spb - 1) / 2 * ch
    val nBlocks = (a.frames + spb - 1) / spb
    val dataSize = nBlocks * blockAlign
    val out = new Array[Byte](12 + 8 + 20 + 8 + 4 + 8 + dataSize)
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
    putTag(0, "RIFF"); put32(4, out.length - 8L); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 20L)
    put16(20, 0x11); put16(22, ch); put32(24, a.sampleRate.toLong)
    put32(28, a.sampleRate.toLong * blockAlign / spb) // approx byte rate
    put16(32, blockAlign); put16(34, 4)
    put16(36, 2); put16(38, spb) // cbSize, wSamplesPerBlock
    putTag(40, "fact"); put32(44, 4L); put32(48, a.frames.toLong)
    putTag(52, "data"); put32(56, dataSize.toLong)
    val dataOff = 60

    // pad the tail block by repeating the last frame (silence for empty)
    def sample(f: Int, c: Int): Int =
      if (a.frames == 0) 0
      else a.samples(math.min(f, a.frames - 1) * ch + c).toInt

    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val frame0 = blk * spb
      val states = Array.tabulate(ch) { c =>
        val s0 = sample(frame0, c)
        val st = new AdpcmState(s0, 0)
        put16(base + 4 * c, s0 & 0xffff)
        out(base + 4 * c + 2) = st.index.toByte
        out(base + 4 * c + 3) = 0
        st
      }
      val dataBase = base + 4 * ch
      val wordsPerChan = (spb - 1) / 8
      var word = 0
      while (word < wordsPerChan) {
        var c = 0
        while (c < ch) {
          val wp = dataBase + (word * ch + c) * 4
          var b = 0
          while (b < 4) {
            val f1 = frame0 + 1 + word * 8 + b * 2
            def nib(f: Int): Int = {
              val st = states(c)
              val target = sample(f, c)
              var diff = target - st.predictor
              var n = 0
              if (diff < 0) { n = 8; diff = -diff }
              val s = StepTable(st.index)
              if (diff >= s) { n |= 4; diff -= s }
              if (diff >= (s >> 1)) { n |= 2; diff -= s >> 1 }
              if (diff >= (s >> 2)) n |= 1
              st.step(n) // advance shared quantizer state
              n
            }
            val lo = nib(f1)
            val hi = nib(f1 + 1)
            out(wp + b) = (lo | (hi << 4)).toByte
            b += 1
          }
          c += 1
        }
        word += 1
      }
      blk += 1
    }
    out
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
