package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Bucket-decomposed range join: boundary semantics of the half-open
  * interval, multi-bucket spans, and randomized agreement with the naive
  * theta join at several bucket widths. */
class RangeJoinSpec extends SparkSpec {

  private def run(points: Seq[Double], ivs: Seq[(String, Double, Double)],
      width: Double): Set[(Double, String)] = {
    val spark2 = spark
    import spark2.implicits._
    val p = points.toDF("p")
    val i = ivs.toDF("name", "lo", "hi")
    RangeJoin.pointInInterval(p, "p", i, "lo", "hi", width)
      .select($"p", $"name")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSet
  }

  test("half-open boundaries: lo included, hi excluded") {
    val got = run(Seq(0.0, 10.0, 5.0), Seq(("a", 0.0, 10.0)), width = 4.0)
    assert(got === Set((0.0, "a"), (5.0, "a")))
  }

  test("interval spanning many buckets still matches every point in it") {
    val got = run(Seq(1.0, 50.0, 99.0, 100.0), Seq(("wide", 0.0, 100.0)),
      width = 7.0)
    assert(got === Set((1.0, "wide"), (50.0, "wide"), (99.0, "wide")))
  }

  test("negative coordinates bucket correctly") {
    val got = run(Seq(-5.0, -0.5, 0.5), Seq(("neg", -6.0, 0.0)), width = 2.5)
    assert(got === Set((-5.0, "neg"), (-0.5, "neg")))
  }

  test("reserved __bucket column on an input fails fast, not clobber") {
    val spark2 = spark
    import spark2.implicits._
    val p = Seq((1.0, 0L)).toDF("p", "__bucket")
    val i = Seq(("a", 0.0, 10.0)).toDF("name", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "p", i, "lo", "hi", 4.0)
    }
    assert(e.getMessage.contains("__bucket"))
  }

  test("randomized agreement with the naive theta join") {
    val rnd = new Random(2026)
    val points = Seq.fill(300)(rnd.nextDouble() * 200 - 100)
    val ivs = Seq.tabulate(40) { k =>
      val lo = rnd.nextDouble() * 180 - 100
      (s"iv$k", lo, lo + rnd.nextDouble() * 30)
    }
    val naive = (for {
      p <- points; (n, lo, hi) <- ivs if p >= lo && p < hi
    } yield (p, n)).toSet
    for (width <- Seq(1.0, 8.0, 64.0))
      assert(run(points, ivs, width) === naive, s"width=$width")
  }
}
