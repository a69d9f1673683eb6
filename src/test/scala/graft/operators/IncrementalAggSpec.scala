package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic properties of the materialized-view refresh: merge equals
  * full recompute, associativity over successive deltas, empty-delta
  * identity, and min/max maintenance under insert-only. */
class IncrementalAggSpec extends SparkSpec {

  private def rows = (1 to 100).map { i =>
    (i.toLong, s"k${i % 3}", (i * 7 % 50).toLong)
  }

  private def partial(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("k"))
    .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
      min(col("v")).as("lo"), max(col("v")).as("hi"))

  private def collectAgg(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("refresh(state, delta) equals the full recompute") {
    val spark2 = spark
    import spark2.implicits._
    val all = rows.toDF("id", "k", "v")
    val state = partial(all.filter($"id" % 10 =!= 7))
    val delta = partial(all.filter($"id" % 10 === 7))
    val merged = IncrementalAgg.refresh(state, delta, Seq("k"),
      sumCols = Seq("n", "s"), minCols = Seq("lo"), maxCols = Seq("hi"))
    assert(collectAgg(merged) === collectAgg(partial(all)))
  }

  test("refresh is associative over successive deltas; empty delta is identity") {
    val spark2 = spark
    import spark2.implicits._
    val all = rows.toDF("id", "k", "v")
    val parts = (0 to 2).map(m => partial(all.filter($"id" % 3 === m)))
    val oneShot = IncrementalAgg.refresh(
      IncrementalAgg.refresh(parts(0), parts(1), Seq("k"),
        sumCols = Seq("n", "s"), minCols = Seq("lo"), maxCols = Seq("hi")),
      parts(2), Seq("k"),
      sumCols = Seq("n", "s"), minCols = Seq("lo"), maxCols = Seq("hi"))
    assert(collectAgg(oneShot) === collectAgg(partial(all)))
    val empty = partial(all.filter(lit(false)))
    val id = IncrementalAgg.refresh(partial(all), empty, Seq("k"),
      sumCols = Seq("n", "s"), minCols = Seq("lo"), maxCols = Seq("hi"))
    assert(collectAgg(id) === collectAgg(partial(all)))
  }

  test("a delta introducing a NEW key lands in the refreshed state") {
    val spark2 = spark
    import spark2.implicits._
    val state = partial(Seq((1L, "a", 5L)).toDF("id", "k", "v"))
    val delta = partial(Seq((2L, "b", 9L)).toDF("id", "k", "v"))
    val merged = collectAgg(IncrementalAgg.refresh(state, delta, Seq("k"),
      sumCols = Seq("n", "s"), minCols = Seq("lo"), maxCols = Seq("hi")))
    assert(merged === Map("a" -> (1L, 5L, 5L, 5L), "b" -> (1L, 9L, 9L, 9L)))
  }
}
