package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bottom-k sampling aggregate: exactness below k, uniform subset above,
  * and the property that justifies it over a reservoir — invariance to
  * partitioning (the distributed merge is exact). */
class SketchAggsSpec extends SparkSpec {

  private def sampleOf(values: Seq[Long], k: Int, seed: Long,
      partitions: Int): Seq[Long] = {
    val spark2 = spark
    import spark2.implicits._
    values.toDF("v").repartition(partitions)
      .agg(SketchAggs.bottomKSample($"v", k, seed).as("s"))
      .collect().head.getSeq[Long](0)
  }

  test("groups with ≤ k distinct values are returned exactly") {
    assert(sampleOf(Seq(5L, 3L, 9L, 3L, 5L), k = 5, seed = 1L, 3) ===
      Seq(3L, 5L, 9L))
    assert(sampleOf(Seq.empty, k = 5, seed = 1L, 1) === Seq.empty)
  }

  test("samples are subsets of the input with size k, distinct-unique") {
    val values = (1L to 500L) ++ (1L to 500L) // duplicates collapse
    val s = sampleOf(values, k = 7, seed = 2L, 4)
    assert(s.size === 7)
    assert(s.distinct.size === 7)
    assert(s.forall(v => v >= 1 && v <= 500))
  }

  test("result is invariant to partitioning (exact distributed merge)") {
    val values = (1L to 2000L).map(i => i * 13 % 997)
    val one = sampleOf(values, k = 10, seed = 3L, partitions = 1)
    val many = sampleOf(values, k = 10, seed = 3L, partitions = 13)
    assert(one === many)
  }

  test("different seeds draw different samples; same seed reproduces") {
    val values = (1L to 1000L).toSeq
    val a = sampleOf(values, k = 10, seed = 4L, 4)
    val b = sampleOf(values, k = 10, seed = 5L, 4)
    assert(a === sampleOf(values, k = 10, seed = 4L, 4))
    assert(a !== b)
  }

  test("int columns widen implicitly; non-numeric types fail analysis") {
    graft.plans.GraftExtensions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    Seq(3, 1, 2).toDF("v").createOrReplaceTempView("bks_int")
    // INT child: ImplicitCastInputTypes widens to long instead of a
    // runtime ClassCastException
    val got = spark.sql("SELECT bottom_k_sample(v, 5, 1) FROM bks_int")
      .head().getSeq[Long](0)
    assert(got === Seq(1L, 2L, 3L))
    // non-castable child (array): rejected at analysis time, not at
    // task runtime (strings implicitly cast like any numeric agg and
    // fail per-value at runtime — standard Spark semantics)
    Seq(Seq(1L)).toDF("a").createOrReplaceTempView("bks_arr")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bottom_k_sample(a, 5, 1) FROM bks_arr").collect()
    }
  }

  test("out-of-range k literal errors instead of silently wrapping") {
    graft.plans.GraftExtensions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    Seq(3L, 1L, 2L).toDF("v").createOrReplaceTempView("bks_range")
    // 4294967298 = 2^32 + 2: a bare .toInt would make this k = 2
    val e = intercept[Throwable] {
      spark.sql("SELECT bottom_k_sample(v, 4294967298, 1) FROM bks_range")
        .collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("k must be in [1,"))
    intercept[Throwable] {
      spark.sql("SELECT bottom_k_sample(v, 0, 1) FROM bks_range").collect()
    }
  }

  test("per-group sampling via groupBy, null inputs skipped") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(9L))).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(SketchAggs.bottomKSample($"v", 5, 1L).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(1L, 2L))
    assert(got("b") === Seq(9L))
  }

  test("sampling is roughly uniform over many seeds") {
    // 100 seeds × k=10 over values 0..99: each value should be drawn
    // ~10 times; a badly skewed hash would concentrate mass
    val values = (0L until 100L).toSeq
    val counts = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    for (seed <- 0 until 100)
      sampleOf(values, k = 10, seed = seed.toLong, 2)
        .foreach(v => counts(v) += 1)
    val drawn = counts.values.sum
    assert(drawn === 1000)
    assert(counts.values.max <= 30, s"hot value drawn ${counts.values.max}x")
  }
}
