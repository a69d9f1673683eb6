package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

import graft.SparkSpec

/** The real PPM kernel: header parsing (comments, whitespace), decode
  * exactness, resize arithmetic, round-trip, feature vector, and the
  * distributed resizePpm path incl. non-PPM passthrough. */
class PpmSpec extends SparkSpec {

  /** Hand-built P6: pixels row-major, (r,g,b) per pixel. */
  private def ppm(w: Int, h: Int, px: Seq[(Int, Int, Int)],
      header: String = ""): Array[Byte] = {
    val head = if (header.nonEmpty) header else s"P6\n$w $h\n255\n"
    head.getBytes(US_ASCII) ++
      px.flatMap(p => Seq(p._1.toByte, p._2.toByte, p._3.toByte)).toArray
  }

  private val red = (255, 0, 0)
  private val blue = (0, 0, 255)

  test("decode a 2x2 image and compute exact channel means") {
    val img = Ppm.decode(ppm(2, 2, Seq(red, red, blue, blue))).get
    assert(img.width === 2 && img.height === 2)
    assert(Ppm.meanRgb(img) === ((127.5, 0.0, 127.5)))
  }

  test("header comments and flexible whitespace parse per the spec") {
    val withComments = ppm(2, 1, Seq(red, blue),
      header = "P6 # a comment\n# another line\n 2\t1 # dims\n255\n")
    val img = Ppm.decode(withComments).get
    assert(img.width === 2 && img.height === 1)
  }

  test("malformed payloads decode to None, never throw") {
    assert(Ppm.decode(null).isEmpty)
    assert(Ppm.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Ppm.decode("P6\n2 2\n255\n".getBytes(US_ASCII)).isEmpty) // truncated
    assert(Ppm.decode("P6\n2 2\n65535\n".getBytes(US_ASCII)).isEmpty) // 2-byte
    assert(Ppm.decode("P3\n1 1\n255\n".getBytes(US_ASCII)).isEmpty) // ASCII ppm
  }

  test("encode/decode round-trip is lossless") {
    val img = Ppm.decode(ppm(3, 2, Seq.tabulate(6)(i => (i, i * 2, i * 3)))).get
    val back = Ppm.decode(Ppm.encode(img)).get
    assert(back.width === 3 && back.height === 2)
    assert(back.pixels.toSeq === img.pixels.toSeq)
  }

  test("nearest-neighbor 4x4 to 2x2 picks the expected source pixels") {
    // quadrant-colored 4x4: top-left red, top-right blue rows etc.
    val px = Seq.tabulate(16) { i =>
      val (x, y) = (i % 4, i / 4)
      if (x < 2 && y < 2) red else if (y < 2) blue
      else if (x < 2) (0, 255, 0) else (255, 255, 0)
    }
    val out = Ppm.resizeNearest(Ppm.decode(ppm(4, 4, px)).get, 2, 2)
    // output (x,y) samples input (2x, 2y) — one pixel from each quadrant
    assert(out.pixels.toSeq === ppm(2, 2,
      Seq(red, blue, (0, 255, 0), (255, 255, 0))).drop("P6\n2 2\n255\n".length).toSeq)
  }

  test("featureKernel: real features for PPM, fallback for other bytes") {
    val good = ppm(2, 2, Seq(red, red, blue, blue))
    val bad = Array[Byte](9, 9, 9)
    val Seq(f1, f2) = Ppm.featureKernel()(Seq(good, bad))
    assert(f1.length === 13 && f2.length === 13)
    assert(f1.take(5).toSeq === Seq(2f, 2f, 0.5f, 0f, 0.5f))
    assert(math.abs(f1.drop(5).sum - 1.0f) < 1e-6) // histogram mass 1
    assert(f2.toSeq === Multimodal.fakeKernel(13)(Seq(bad)).head.toSeq)
  }

  test("resizePpm: distributed resize with non-PPM passthrough") {
    val spark2 = spark
    import spark2.implicits._
    val big = ppm(8, 4, Seq.fill(32)(red))
    val small = ppm(2, 1, Seq(red, blue))
    val junk = Array[Byte](1, 2, 3)
    val df = Seq((1L, big), (2L, small), (3L, junk)).toDF("media_id", "payload")
    val out = Multimodal.resizePpm(df, maxSide = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(1L).out_width === 4 && out(1L).out_height === 2)
    val resized = Ppm.decode(out(1L).payload).get
    assert(resized.width === 4 && resized.height === 2)
    assert(Ppm.meanRgb(resized) === ((255.0, 0.0, 0.0)))
    // already fits: bytes pass through identical
    assert(out(2L).payload.toSeq === small.toSeq)
    assert(out(2L).out_width === 2 && out(2L).out_height === 1)
    // undecodable: untouched, flagged
    assert(out(3L).payload.toSeq === junk.toSeq)
    assert(out(3L).out_width === -1)
  }
}
