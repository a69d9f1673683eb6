package graft

import org.apache.spark.sql.functions._

/** Pins the libm-free round(sigmoid(margin), 3) replay device
  * (LrReplaySql.p1BucketCutoffs) that the q_linkpred_e2e oracle ships:
  * 1000 binary-searched margin-space cutoffs must classify every
  * margin double into exactly the bucket Spark's own Round expression
  * produces for the model's probability. */
class LrReplaySqlSpec extends SparkSpec {

  test("p1BucketCutoffs: 1000 strictly-increasing minimal boundaries") {
    val c = LrReplaySql.p1BucketCutoffs
    assert(c.length === 1000)
    c.sliding(2).foreach { case Seq(a, b) => assert(a < b, s"$a !< $b") }
    (1 to 1000).foreach { j =>
      val cj = c(j - 1)
      assert(LrReplaySql.p1Bucket(cj) >= j, s"j=$j cut=$cj")
      // minimality: the predecessor double falls strictly below j
      assert(LrReplaySql.p1Bucket(Math.nextDown(cj)) < j,
        s"j=$j cut=$cj not minimal")
    }
  }

  test("bucket-from-cutoffs ≡ p1Bucket at every double, INCLUDING the " +
    "adversarial boundary-adjacent probes (internal consistency)") {
    val cuts = LrReplaySql.p1BucketCutoffs
    val probes = cuts.flatMap(c =>
      Seq(Math.nextDown(c), c, Math.nextUp(c))) ++
      (-12000 to 12000).map(_ / 1000.0)
    probes.foreach { m =>
      assert(cuts.count(_ <= m) === LrReplaySql.p1Bucket(m), s"m=$m")
    }
  }

  test("bucket-from-cutoffs ≡ Spark's round(1/(1+exp(-m)), 3) on a dense " +
    "margin grid (the realistic-margin agreement the oracle rests on)") {
    val cuts = LrReplaySql.p1BucketCutoffs
    // dense ±12 grid over the sigmoid's active range. Deliberately NOT
    // probing ±1 ulp of the boundaries: Math.exp (Spark's scoring path)
    // is JIT-state-dependent there (intrinsic vs fdlibm, 1 ulp), so the
    // boundary neighborhoods are nondeterministic in Spark ITSELF — see
    // the p1Bucket scaladoc for the measure-zero risk accounting. A
    // step-0.001 grid point sitting within 1 ulp of one of the 1000
    // irrational boundaries would be an astronomical coincidence.
    val grid = (-12000 to 12000).map(_ / 1000.0)
    val spark2 = spark
    import spark2.implicits._
    // Spark evaluates ITS Round (codegen path) over the ml-identical
    // sigmoid shape 1.0/(1.0+exp(-m))
    val sparkSide = grid.toDF("m")
      .select($"m", round(lit(1.0) / (lit(1.0) + exp(-$"m")), 3).as("p1r"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    grid.foreach { m =>
      val j = cuts.count(_ <= m)
      val replay = j / 1000.0
      assert(sparkSide(m) === replay,
        s"m=$m spark=${sparkSide(m)} replay=$replay (j=$j)")
    }
  }
}
