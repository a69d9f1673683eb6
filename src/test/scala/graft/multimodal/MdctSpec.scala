package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Evidence chain for the MDCT/TDAC transform codec (`Mdct.scala`):
  *
  *  1. the Princen–Bradley TDAC proof obligation stated in the Mdct
  *     docstring — UNQUANTIZED mdct→imdct→overlap-add reconstructs the
  *     signal to float precision, including at non-multiple-of-N tails;
  *  2. the full quantized encode→decode round trip: silence is exact,
  *     tones come back within the 10-bit banded-scalefactor error bound;
  *  3. the reject-malformed contract (None, never a throw), including
  *     the per-channel bitstream bound: a stereo payload whose channel-0
  *     stream under-runs its declared length must be rejected, not
  *     silently continued into channel 1's bytes.
  */
class MdctSpec extends AnyFunSuite {

  private val N = Mdct.N

  /** Frame exactly as Mdct.encode does (hop N, window t covers
    * [(t-1)N, (t+1)N) with zero padding outside the signal), transform,
    * inverse, overlap-add exactly as Mdct.decode does. */
  private def roundTripUnquantized(x: Array[Double]): Array[Double] = {
    val perCh = x.length
    val frames = perCh / N + 2
    val acc = new Array[Double]((frames + 1) * N)
    var t = 0
    while (t < frames) {
      val block = Array.tabulate(2 * N) { n =>
        val idx = (t - 1) * N + n
        if (idx < 0 || idx >= perCh) 0.0 else x(idx)
      }
      val y = Mdct.imdct(Mdct.mdct(block))
      var i = 0
      while (i < 2 * N) { acc(t * N + i) += y(i); i += 1 }
      t += 1
    }
    Array.tabulate(perCh)(s => acc(s + N))
  }

  test("TDAC: unquantized mdct/imdct/overlap-add is exact (multiple of N)") {
    val rnd = new java.util.Random(7L)
    val x = Array.fill(4 * N)(rnd.nextDouble() * 2 - 1)
    val y = roundTripUnquantized(x)
    val maxErr = x.indices.map(i => math.abs(x(i) - y(i))).max
    assert(maxErr < 1e-10, s"max reconstruction error $maxErr")
  }

  test("TDAC: exact at a non-multiple-of-N length (tail windows padded)") {
    val rnd = new java.util.Random(8L)
    val x = Array.fill(3 * N + 97)(rnd.nextDouble() * 2 - 1)
    val y = roundTripUnquantized(x)
    val maxErr = x.indices.map(i => math.abs(x(i) - y(i))).max
    assert(maxErr < 1e-10, s"max reconstruction error $maxErr")
  }

  test("silence round-trips bit-exactly through silent-band elision") {
    val a = Wav.Audio(16000, 2, new Array[Short](2 * 1000))
    val dec = Mdct.decode(Mdct.encode(a))
    assert(dec.isDefined)
    val d = dec.get
    assert(d.sampleRate == 16000 && d.channels == 2)
    assert(d.samples.length == a.samples.length)
    assert(d.samples.forall(_ == 0), "silent input must decode to exact zeros")
    // silent bands carry one sentinel byte instead of N/32 10-bit codes,
    // so the silent payload must be far smaller than a tonal one
    val tonal = Wav.Audio(16000, 2, Array.tabulate[Short](2 * 1000)(i =>
      (8000 * math.sin(i * 0.13)).toShort))
    assert(Mdct.encode(a).length < Mdct.encode(tonal).length / 4)
  }

  test("quantized stereo tone round trip: SNR above the 10-bit band floor") {
    // distinct per-channel tones at a non-multiple-of-N length
    val perCh = 3 * N + 201
    val samples = Array.tabulate[Short](perCh * 2) { i =>
      val s = i / 2
      if (i % 2 == 0) (9000 * math.sin(2 * math.Pi * 0.031 * s)).toShort
      else (6000 * math.cos(2 * math.Pi * 0.0117 * s)).toShort
    }
    val a = Wav.Audio(22050, 2, samples)
    val dec = Mdct.decode(Mdct.encode(a))
    assert(dec.isDefined, "valid payload must decode")
    val d = dec.get
    assert(d.samples.length == samples.length)
    var sig = 0.0; var err = 0.0
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toDouble
      val e = s - d.samples(i).toDouble
      sig += s * s; err += e * e
      i += 1
    }
    val snrDb = 10 * math.log10(sig / math.max(err, 1e-12))
    // midtread codes in [-511,511] against a ≤2× band-peak scale bound
    // the per-coefficient error at peak/511 → well above 30 dB; assert a
    // conservative floor so quantizer regressions surface loudly
    assert(snrDb > 30.0, s"round-trip SNR $snrDb dB below floor")
  }

  test("mono round trip preserves header fields and length") {
    val a = Wav.Audio(8000, 1, Array.tabulate[Short](777)(i =>
      (3000 * math.sin(i * 0.07)).toShort))
    val d = Mdct.decode(Mdct.encode(a)).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.samples.length == 777)
  }

  test("malformed payloads are rejected with None, never a throw") {
    val valid = Mdct.encode(Wav.Audio(8000, 1,
      Array.tabulate[Short](600)(i => (2500 * math.sin(i * 0.1)).toShort)))
    assert(Mdct.decode(Array.emptyByteArray).isEmpty)
    assert(Mdct.decode(valid.take(10)).isEmpty)
    val badMagic = valid.clone(); badMagic(0) = 'X'.toByte
    assert(Mdct.decode(badMagic).isEmpty)
    // forged sample count far beyond what the payload can carry
    val forged = valid.clone()
    forged(9) = 0x7f.toByte
    assert(Mdct.decode(forged).isEmpty)
    // forged frame size N — only the one profile is accepted
    val badN = valid.clone(); badN(16) = 1.toByte
    assert(Mdct.decode(badN).isEmpty)
    // truncated mid-bitstream
    assert(Mdct.decode(valid.take(valid.length - 7)).isEmpty)
  }

  test("stereo channel-0 bitstream under-running its declared length " +
      "is rejected (no read into channel 1's bytes)") {
    val a = Wav.Audio(8000, 2, Array.tabulate[Short](2 * 600)(i =>
      (2500 * math.sin(i * 0.05) + 500 * (i % 2)).toShort))
    val valid = Mdct.encode(a)
    assert(Mdct.decode(valid).isDefined)
    def i32(off: Int): Int =
      ((valid(off) & 0xff) << 24) | ((valid(off + 1) & 0xff) << 16) |
        ((valid(off + 2) & 0xff) << 8) | (valid(off + 3) & 0xff)
    val ch0Len = i32(17)
    val cut = 3 // drop 3 bytes off channel 0's stream, keep ch1 intact
    val newLen = ch0Len - cut
    val header = valid.take(17)
    val lenField = Array[Byte]((newLen >>> 24).toByte, (newLen >>> 16).toByte,
      (newLen >>> 8).toByte, newLen.toByte)
    val ch0 = valid.slice(21, 21 + newLen)
    val rest = valid.drop(21 + ch0Len) // ch1 length field + bytes, intact
    val forged = header ++ lenField ++ ch0 ++ rest
    assert(Mdct.decode(forged).isEmpty,
      "under-running channel stream must be rejected, not read past its bound")
  }
}
