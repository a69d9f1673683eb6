package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import TextOps._

  test("commonWordsMultiset keeps duplicate multiplicity (reference Q5)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Seq("a", "a", "b"), Seq("a", "a", "c")),   // multiset 2, set 1
      (Seq("x", "y"), Seq("z")),                  // 0
      (null, Seq("a"))                            // null-safe → 0
    ).toDF("l", "r")
    val out = df.select(
      commonWordsMultiset($"l", $"r").as("m"),
      commonWordsSet($"l", $"r").as("s")).collect()
    assert(out(0).getInt(0) === 2)
    assert(out(0).getInt(1) === 1)
    assert(out(1).getInt(0) === 0)
    assert(out(2).getInt(0) === 0)
  }

  test("yearDiff: built-in abs-diff, null-propagating with try_cast") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("1999", "2003"), ("bad", "2000"), ("2001", "1993"))
      .toDF("a", "b")
    val out = df.select(yearDiff($"a", $"b")).collect()
    assert(out(0).getInt(0) === 4)
    assert(out(1).isNullAt(0))      // malformed year → null, never a throw
    assert(out(2).getInt(0) === 8)
  }

  test("sameJournal: empty-equals-empty kept for fidelity (reference Q3)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("JHEP", "JHEP"), ("JHEP", "PRL"), ("", "")).toDF("a", "b")
    assert(df.select(sameJournal($"a", $"b")).collect().map(_.getInt(0)).toSeq
      === Seq(1, 0, 1))
  }

  test("shingles: n-grams, short docs give empty") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Seq("a", "b", "c"), Seq("a")).toDF("t")
    val out = df.select(shingles($"t", 2)).collect()
    assert(out(0).getSeq[String](0) === Seq("a b", "b c"))
    assert(out(1).getSeq[String](0) === Seq())
  }

  test("rollingHash is deterministic and order-sensitive") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Seq("a", "b"), Seq("b", "a"), Seq("a", "b")).toDF("t")
    val out = df.select(rollingHash($"t")).collect().map(_.getLong(0))
    assert(out(0) === out(2))
    assert(out(0) !== out(1))
  }

  test("tokenCountBpeIsh splits word/number/punct boundaries") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("hello world", "abc123,def").toDF("s")
    val out = df.select(tokenCountBpeIsh($"s")).collect().map(_.getInt(0))
    assert(out(0) === 2)          // hello, world
    assert(out(1) === 4)          // abc / 123 / , / def
  }

  test("trigramScore: fraction of trigrams in profile") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("aaaa").toDF("s")  // trigrams: aaa, aaa
    val hit = df.select(trigramScore($"s", Seq("aaa"))).head.getDouble(0)
    val miss = df.select(trigramScore($"s", Seq("zzz"))).head.getDouble(0)
    assert(hit === 1.0)
    assert(miss === 0.0)
  }
}
