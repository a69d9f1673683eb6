package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native MultisetIntersectCount expression must be value-identical
  * to the fidelity UDF (reference Seq.intersect semantics) on every
  * input shape: duplicates, empties, nulls, asymmetric sizes.
  */
class TextExprsSpec extends SparkSpec {

  test("expression == UDF on randomized token multisets") {
    val spark2 = spark
    import spark2.implicits._
    // 300 deterministic pseudo-random pairs over a tiny vocab so
    // duplicates and overlaps are dense
    val vocab = Vector("a", "b", "c", "dd", "ee", "f")
    def seqOf(seed: Long): Seq[String] = {
      val n = (seed % 9).toInt
      (0 until n).map(i => vocab(((seed >> (i % 5)) % vocab.size).toInt.abs))
    }
    val rows = (1 to 300).map { i =>
      (seqOf(i * 2654435761L), seqOf(i * 40503L + 7))
    }
    val df = rows.toDF("a", "b")
      .withColumn("expr_cnt", TextExprs.commonWordsMultiset($"a", $"b"))
      .withColumn("udf_cnt", TextOps.commonWordsMultiset($"a", $"b"))
    val mismatches = df.filter($"expr_cnt" =!= $"udf_cnt").count()
    assert(mismatches === 0)
    // and against the in-process reference directly
    df.select($"a", $"b", $"expr_cnt").collect().foreach { r =>
      val expect = r.getSeq[String](0).intersect(r.getSeq[String](1)).size
      assert(r.getInt(2) === expect)
    }
  }

  test("null arrays -> 0 (UDF contract); empty -> 0; multiplicity counted") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Seq("x", "x", "y"), Seq("x", "x", "x")), // multiset min(2,3) = 2
      (Seq.empty[String], Seq("x")),
      (null, Seq("x"))
    ).toDF("a", "b")
      .withColumn("cnt", TextExprs.commonWordsMultiset($"a", $"b"))
    assert(df.select($"cnt").collect().map(_.getInt(0)).toSeq === Seq(2, 0, 0))
  }

  test("SQL registration: multiset_intersect_count usable from spark.sql") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT multiset_intersect_count(array('a','a','b'), array('a','a','a')) AS c")
      .collect().head.getInt(0)
    assert(got === 2)
  }
}
