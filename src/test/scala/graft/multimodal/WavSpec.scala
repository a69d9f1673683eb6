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
}
