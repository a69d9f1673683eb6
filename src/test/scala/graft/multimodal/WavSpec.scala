package graft.multimodal

import graft.SparkSpec

/** The real WAV kernel: RIFF chunk walk, PCM decode exactness (8/16-bit,
  * mono/stereo), forged-size rejection, features, resample, and the
  * distributed audioFeatures path incl. non-WAV fallthrough. */
class WavSpec extends SparkSpec {

  private def tone(frames: Int, channels: Int = 1,
      rate: Int = 8000): Wav.Audio = {
    val samples = Array.tabulate[Short](frames * channels)(i =>
      (((i * 37) % 4001) - 2000).toShort)
    Wav.Audio(rate, channels, samples)
  }

  test("encode/decode round-trip is bit-exact (16-bit, mono and stereo)") {
    for (ch <- Seq(1, 2)) {
      val a = tone(500, ch)
      val d = Wav.decode(Wav.encode(a)).get
      assert(d.sampleRate === a.sampleRate)
      assert(d.channels === ch)
      assert(d.samples.toSeq === a.samples.toSeq)
    }
  }

  test("8-bit unsigned PCM widens to centered 16-bit") {
    // hand-build an 8-bit mono file: values 128±d map to ±(d<<8)
    val a = tone(4)
    val enc = Wav.encode(a)
    // patch: bits=8, data chunk holds 4 unsigned bytes
    val bytes8 = Array[Int](128, 129, 127, 255).map(_.toByte)
    val b = new java.io.ByteArrayOutputStream()
    b.write(enc, 0, 34) // up through bitsPerSample offset
    b.write(Array[Byte](8, 0)) // bitsPerSample = 8
    b.write("data".getBytes, 0, 4)
    b.write(Array[Byte](4, 0, 0, 0))
    b.write(bytes8, 0, 4)
    val d = Wav.decode(b.toByteArray).get
    assert(d.samples.toSeq === Seq[Short](0, 256, -256, (127 << 8).toShort))
  }

  test("unknown chunks before data are skipped (word-aligned)") {
    val a = tone(10)
    val enc = Wav.encode(a)
    // splice an odd-sized LIST chunk between fmt and data
    val b = new java.io.ByteArrayOutputStream()
    b.write(enc, 0, 36)
    b.write("LIST".getBytes, 0, 4)
    b.write(Array[Byte](3, 0, 0, 0)) // size 3 → padded to 4
    b.write(Array[Byte](1, 2, 3, 0), 0, 4)
    b.write(enc, 36, enc.length - 36)
    val spliced = b.toByteArray
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    assert(Wav.decode(spliced).get.samples.toSeq === a.samples.toSeq)
  }

  test("rejection: magic, non-PCM, bad depth, size forgeries") {
    val good = Wav.encode(tone(100))
    assert(Wav.decode(null) === None)
    assert(Wav.decode(Array.empty[Byte]) === None)
    assert(Wav.decode("RIFFxxxxWAVX".getBytes ++ good.drop(12)) === None)
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float
    assert(Wav.decode(nonPcm) === None)
    val depth24 = good.clone(); depth24(34) = 24
    assert(Wav.decode(depth24) === None)
    // data chunk claiming more bytes than present: forged size
    val forged = good.clone()
    forged(40) = (-1).toByte; forged(41) = (-1).toByte
    forged(42) = (-1).toByte; forged(43) = 0x7f.toByte
    assert(Wav.decode(forged) === None)
    // truncated raster
    assert(Wav.decode(good.dropRight(10)) === None)
    // data before any fmt chunk
    val noFmt = good.take(12) ++ good.drop(36)
    assert(Wav.decode(noFmt) === None)
  }

  test("features: duration, rms, peak, zero crossings on a known square") {
    val amp = 1000
    val samples = Array.tabulate[Short](800)(i =>
      (if ((i / 100) % 2 == 0) amp else -amp).toShort)
    val a = Wav.Audio(8000, 1, samples)
    assert(a.durationMs === 100L)         // 800 frames @ 8 kHz
    assert(Wav.peak(a) === amp)
    assert(math.abs(Wav.rms(a) - amp) < 1e-9) // square wave rms == amp
    assert(Wav.zeroCrossings(a) === 7L)   // 8 blocks → 7 sign changes
  }

  test("toMono averages channels; resampleNearest halves frames") {
    val st = Wav.Audio(8000, 2, Array[Short](100, 200, -100, -300, 50, 150))
    assert(Wav.toMono(st).samples.toSeq === Seq[Short](150, -200, 100))
    val down = Wav.resampleNearest(tone(1000), 4000)
    assert(down.sampleRate === 4000)
    assert(down.frames === 500)
    // nearest mapping picks every other source frame
    assert(down.samples(7) === tone(1000).samples(14))
  }

  test("audioFeatures: distributed decode, integer features, non-WAV rows") {
    val rows = Seq(
      (1L, Wav.encode(tone(800, 1, 8000))),
      (2L, Wav.encode(tone(400, 2, 16000))),
      (3L, "not audio".getBytes))
    val df = spark.createDataFrame(rows).toDF("media_id", "payload")
    val out = Multimodal.audioFeatures(df).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(1L).decoded && out(1L).duration_ms === 100L)
    assert(out(1L).rms256 === math.round(Wav.rms(tone(800)) * 256))
    assert(out(2L).decoded && out(2L).channels === 2 &&
      out(2L).duration_ms === 25L)
    assert(!out(3L).decoded && out(3L).sample_rate === -1)
  }

  test("wavStats: driver-evidence batch decodes every generated clip") {
    val rows = Multimodal.wavStats(spark, n = 16).collect()
    assert(rows.length === 16)
    assert(rows.forall(_.getAs[Boolean]("decoded")))
    // id 0: rate 8000, 400 mono frames of ±3000 square, period 20
    val r0 = rows.find(_.getAs[Long]("media_id") == 0L).get
    assert(r0.getAs[Int]("sample_rate") === 8000)
    assert(r0.getAs[Long]("duration_ms") === 50L)
    assert(r0.getAs[Int]("peak") === 3000)
    assert(r0.getAs[Long]("rms256") === 3000L * 256)
    assert(r0.getAs[Long]("zero_crossings") === 19L) // 20 blocks of 20
  }

  test("ADPCM: hand-computed quantizer vector decodes exactly") {
    // one mono block, spb=9: header sample 1000 at index 0 (step 7),
    // then 8 nibbles in one 4-byte word. Hand trace:
    //  n=5 (0b0101): d = 0+1+7      =  8 → 1008, idx 0+4 = 4 (step 11)
    //  n=10 (8|2)  : d = 1+5        =  6 → 1002, idx 4−1 = 3 (step 10)
    //  n=0         : d = 1          =  1 → 1003, idx 3−1 = 2 (step 9)
    //  n=15        : d = 1+2+4+9    = 16 →  987, idx 2+8 = 10 (step 19)
    //  n=7         : d = 2+4+9+19   = 34 → 1021, idx 10+8 = 18 (step 41)
    //  n=8         : d = 5          =  5 → 1016, idx 18−1 = 17 (step 37)
    //  n=1         : d = 4+9        = 13 → 1029, idx 17−1 = 16 (step 34)
    //  n=2         : d = 4+17       = 21 → 1050, idx 16−1 = 15
    val payload = new Array[Byte](60 + 8)
    def tag(p: Int, s: String): Unit =
      (0 until 4).foreach(i => payload(p + i) = s.charAt(i).toByte)
    def p32(p: Int, v: Long): Unit =
      (0 until 4).foreach(i => payload(p + i) = ((v >> (8 * i)) & 0xff).toByte)
    def p16(p: Int, v: Int): Unit = {
      payload(p) = (v & 0xff).toByte; payload(p + 1) = ((v >> 8) & 0xff).toByte
    }
    tag(0, "RIFF"); p32(4, payload.length - 8L); tag(8, "WAVE")
    tag(12, "fmt "); p32(16, 20L); p16(20, 0x11); p16(22, 1)
    p32(24, 8000L); p32(28, 8000L); p16(32, 8); p16(34, 4)
    p16(36, 2); p16(38, 9)
    tag(40, "fact"); p32(44, 4L); p32(48, 9L)
    tag(52, "data"); p32(56, 8L)
    p16(60, 1000); payload(62) = 0; payload(63) = 0 // header: pred, idx
    payload(64) = (5 | (10 << 4)).toByte
    payload(65) = (0 | (15 << 4)).toByte
    payload(66) = (7 | (8 << 4)).toByte
    payload(67) = (1 | (2 << 4)).toByte
    val d = Wav.decode(payload).get
    assert(d.samples.toSeq === Seq[Short](1000, 1008, 1002, 1003, 987,
      1021, 1016, 1029, 1050))
  }

  test("ADPCM: constant levels round-trip exactly; ramp within quantizer " +
    "error; stereo channels stay independent") {
    // constant mono and stereo (distinct per-channel levels): exact
    val mono = Wav.Audio(8000, 1, Array.fill[Short](700)(2500))
    assert(Wav.decode(Wav.encodeAdpcm(mono)).get.samples.toSeq ===
      mono.samples.toSeq)
    val st = Wav.Audio(8000, 2, Array.tabulate[Short](600)(i =>
      if (i % 2 == 0) 1200 else -3100))
    val sd = Wav.decode(Wav.encodeAdpcm(st)).get
    assert(sd.channels === 2 && sd.samples.toSeq === st.samples.toSeq)
    // gentle ramp: quantizer tracks within a small absolute error
    val ramp = Wav.Audio(8000, 1,
      Array.tabulate[Short](1000)(i => (i * 16 - 8000).toShort))
    val rd = Wav.decode(Wav.encodeAdpcm(ramp)).get
    assert(rd.frames === 1000)
    val errs = ramp.samples.indices.map(i =>
      math.abs(ramp.samples(i) - rd.samples(i)))
    assert(errs.max <= 256, s"max ramp error ${errs.max}")
    // adversarial square wave: bounded by slew, must still converge back
    val sq = Wav.Audio(8000, 1, Array.tabulate[Short](800)(i =>
      if ((i / 100) % 2 == 0) 3000 else -3000))
    val sqd = Wav.decode(Wav.encodeAdpcm(sq)).get
    // by the end of each 100-sample half-period the codec has re-locked
    assert((0 until 8).forall { half =>
      math.abs(sq.samples(half * 100 + 99) - sqd.samples(half * 100 + 99)) <= 64
    })
  }

  test("ADPCM: malformed geometry and headers are rejected, not thrown") {
    val good = Wav.encodeAdpcm(Wav.Audio(8000, 1, Array.fill[Short](300)(10)))
    assert(Wav.decode(good).isDefined)
    // forged step index > 88 in the block header
    val badIdx = good.clone(); badIdx(62) = 90.toByte
    assert(Wav.decode(badIdx).isEmpty)
    // blockAlign inconsistent with samplesPerBlock
    val badAlign = good.clone()
    badAlign(32) = ((good(32) & 0xff) + 4).toByte
    assert(Wav.decode(badAlign).isEmpty)
    // fact chunk claiming more frames than the blocks can hold
    val badFact = good.clone()
    badFact(48) = 0xff.toByte; badFact(49) = 0xff.toByte
    assert(Wav.decode(badFact).isEmpty)
    // missing fact entirely (rebuild without it): compressed WAV needs it
    val noFact = new Array[Byte](good.length - 12)
    System.arraycopy(good, 0, noFact, 0, 40)
    System.arraycopy(good, 52, noFact, 40, good.length - 52)
    def p32(b: Array[Byte], p: Int, v: Long): Unit =
      (0 until 4).foreach(i => b(p + i) = ((v >> (8 * i)) & 0xff).toByte)
    p32(noFact, 4, noFact.length - 8L)
    assert(Wav.decode(noFact).isEmpty)
  }

  test("adpcmStats: every generated compressed clip decodes on formula") {
    val rows = Multimodal.adpcmStats(spark, n = 12).collect()
    assert(rows.length === 12)
    assert(rows.forall(_.getAs[Boolean]("decoded")))
    // id 1: stereo, levels 2150/2650, 307 frames at 10 kHz
    val r1 = rows.find(_.getAs[Long]("media_id") == 1L).get
    assert(r1.getAs[Int]("channels") === 2)
    assert(r1.getAs[Int]("peak") === 2650)
    assert(r1.getAs[Long]("zero_crossings") === 0L)
    assert(r1.getAs[Long]("rms256") ===
      math.round(math.sqrt((2150.0 * 2150 + 2650.0 * 2650) / 2) * 256))
  }
}
