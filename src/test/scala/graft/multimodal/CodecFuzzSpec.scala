package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input fuzz over every pure-JVM codec: seeded random
  * mutations (byte flips, truncations, splices) of VALID payloads must
  * always return quickly with Some or None — never throw, hang, or
  * over-allocate. This is the executor-safety contract the ADVICE-r6
  * FDICT finding was about, generalized: a decode runs inside a Spark
  * task on untrusted corpus bytes, so any escape (exception, spin, OOM)
  * kills real work. Deterministic seeds (java.util.Random(i)), no
  * scalacheck shrinking needed — a failure prints the seed.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val Rounds = 300

  private def png: Array[Byte] = {
    val px = Array.tabulate[Byte](12 * 9 * 3)(i => (i * 31 % 256).toByte)
    Png.encode(Ppm.Image(12, 9, px))
  }
  private def jpg: Array[Byte] = {
    val px = Array.tabulate[Byte](16 * 12 * 3)(i => (i * 7 % 256).toByte)
    Jpeg.encode(Ppm.Image(16, 12, px))
  }
  private def ppm: Array[Byte] = {
    val px = Array.tabulate[Byte](10 * 8 * 3)(i => (i * 13 % 256).toByte)
    Ppm.encode(Ppm.Image(10, 8, px))
  }
  private def wav: Array[Byte] = {
    val samples = Array.tabulate[Short](600)(i => ((i * 331) % 7919).toShort)
    Wav.encode(Wav.Audio(8000, 2, samples))
  }
  private def y4m: Array[Byte] = {
    val frames = Vector.tabulate(3)(f =>
      Array.tabulate[Byte](8 * 6 * 3 / 2)(i => ((i + f * 40) % 256).toByte))
    Y4m.encode(Y4m.Video(8, 6, 25, 1, subsampled = true, frames))
  }
  private def adpcm: Array[Byte] = {
    val samples = Array.tabulate[Short](520)(i => ((i * 113) % 5000).toShort)
    Wav.encodeAdpcm(Wav.Audio(8000, 2, samples))
  }
  private def mdctGma: Array[Byte] = {
    val samples = Array.tabulate[Short](2 * 700)(i =>
      ((i * 113) % 5000 - 2500).toShort)
    Mdct.encode(Wav.Audio(16000, 2, samples))
  }
  private def avi: Array[Byte] = {
    val frames = Vector.tabulate(3) { f =>
      val px = Array.tabulate[Byte](16 * 16 * 3)(i => ((i * 5 + f) % 256).toByte)
      Jpeg.encode(Ppm.Image(16, 16, px))
    }
    Avi.encode(Avi.Mjpeg(16, 16, 10, 1, frames))
  }

  /** Mutate a valid payload: flip 1-8 bytes, or truncate, or duplicate a
    * slice into the middle — the corruption shapes object stores and
    * truncated downloads actually produce. */
  private def mutate(valid: Array[Byte], rnd: java.util.Random): Array[Byte] =
    rnd.nextInt(4) match {
      case 0 => // byte flips
        val out = valid.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          out(rnd.nextInt(out.length)) = (rnd.nextInt(256) - 128).toByte
        }
        out
      case 1 => valid.take(rnd.nextInt(valid.length)) // truncate
      case 2 => // splice a random slice into the middle
        val at = rnd.nextInt(valid.length)
        val from = rnd.nextInt(valid.length)
        val len = math.min(rnd.nextInt(64), valid.length - from)
        valid.take(at) ++ valid.slice(from, from + len) ++ valid.drop(at)
      case _ => // pure noise of plausible length
        val out = new Array[Byte](rnd.nextInt(valid.length + 1))
        rnd.nextBytes(out)
        out
    }

  private def fuzz(name: String, valid: => Array[Byte],
      decode: Array[Byte] => Any): Unit =
    test(s"$name: $Rounds seeded mutations decode to Some/None, never escape") {
      val base = valid
      // the unmutated payload must decode — guard against a vacuous test
      decode(base) match {
        case None => fail(s"$name: valid payload failed to decode")
        case _ => ()
      }
      (0 until Rounds).foreach { i =>
        val rnd = new java.util.Random(i.toLong)
        val bytes = mutate(base, rnd)
        val t0 = System.nanoTime()
        try decode(bytes)
        catch {
          case e: Throwable =>
            fail(s"$name seed=$i threw ${e.getClass.getSimpleName}: " +
              s"${e.getMessage}")
        }
        val ms = (System.nanoTime() - t0) / 1e6
        // generous bound: a spin (the FDICT class of bug) blows far past
        // this; a normal reject is microseconds
        assert(ms < 2000, s"$name seed=$i took $ms ms")
      }
    }

  fuzz("Png.decode", png, Png.decode)
  fuzz("Jpeg.decode", jpg, Jpeg.decode)
  fuzz("Ppm.decode", ppm, Ppm.decode)
  fuzz("Wav.decode", wav, Wav.decode)
  fuzz("Wav.decode (ADPCM)", adpcm, Wav.decode)
  fuzz("Mdct.decode", mdctGma, Mdct.decode)
  fuzz("Y4m.decode", y4m, Y4m.decode(_))
  // container parse + every frame decompressed, so a mutated JPEG inside
  // a valid container exercises the frame path too
  fuzz("Avi.decode+frames", avi, (b: Array[Byte]) =>
    Avi.decode(b).map(m => m.frames.indices.map(Avi.decodeFrame(m, _))))
  fuzz("decodeImage seam", png, Multimodal.decodeImage)
}
