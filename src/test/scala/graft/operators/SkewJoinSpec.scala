package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join: row-for-row identity with the unsalted join on skewed
  * keys, including duplicate build keys and non-equi ride-along
  * conjuncts. */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join equals plain inner join on a skewed key") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(7)
    // 90% of probe rows share one key — the skew scenario
    val probe = Seq.tabulate(500) { i =>
      (i.toLong, if (rnd.nextDouble() < 0.9) "hot" else s"cold${i % 7}")
    }.toDF("id", "k")
    // duplicate build keys so fan-out > 1 is exercised
    val build = (Seq.tabulate(7)(j => (s"cold$j", j * 10)) ++
      Seq(("hot", 100), ("hot", 200), ("nomatch", 0)))
      .toDF("bk", "v")
    val plain = probe.join(build, $"k" === $"bk")
      .select($"id", $"v").collect().map(r => (r.getLong(0), r.getInt(1)))
    val salted = SkewJoin.salted(probe, build, $"k" === $"bk",
        saltOn = $"id", salts = 8)
      .select($"id", $"v").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(salted.sorted.toSeq === plain.sorted.toSeq)
  }

  test("reserved salt columns on the inputs fail fast, not clobber") {
    val spark2 = spark
    import spark2.implicits._
    val withSalt = Seq((1L, "a", 0)).toDF("id", "k", "__salt")
    val clean = Seq(("a", 1)).toDF("bk", "v")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.salted(withSalt, clean, $"k" === $"bk", saltOn = $"id")
    }
    assert(e.getMessage.contains("__salt"))
    val withBSalt = Seq(("a", 1, 0)).toDF("bk", "v", "__b_salt")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(clean.toDF("id", "k"), withBSalt, $"k" === $"bk",
        saltOn = $"id")
    }
  }

  test("non-equi conjuncts ride along unchanged") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq.tabulate(60)(i => (i.toLong, i % 3)).toDF("a_id", "g")
    val b = Seq.tabulate(60)(i => (i.toLong, i % 3)).toDF("b_id", "bg")
    val plain = a.join(b, $"g" === $"bg" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewJoin.salted(a, b, $"g" === $"bg" && $"a_id" < $"b_id",
        saltOn = $"a_id", salts = 4)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
    assert(plain.size === 3 * (20 * 19) / 2)
  }

  test("salt columns are dropped from the output") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq((1L, "x")).toDF("a_id", "k")
    val b = Seq(("x", 9)).toDF("bk", "v")
    val out = SkewJoin.salted(a, b, $"k" === $"bk", saltOn = $"a_id")
    assert(out.columns.toSeq === Seq("a_id", "k", "bk", "v"))
  }
}
