package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the scale contract of bucketed layout: a join of two tables
  * bucketed on the join key with equal bucket counts plans with NO
  * shuffle exchange (the on-disk hash layout satisfies the join's
  * required distribution).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans without a shuffle exchange") {
    val spark2 = spark
    import spark2.implicits._
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf("sf0.001"))
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 4)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", buckets = 4)

    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      // force SMJ (broadcast would trivially have no shuffle) and freeze
      // the plan (AQE wraps it and hides the final operators from toString)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")

      val joined = Bucketing.bucketJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // sortBy in the layout also removes the per-task sort
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan:\n$plan")

      // and it computes the right thing
      val n = joined.count()
      val expected = li.join(o, "l_orderkey").count()
      assert(n === expected && n > 0)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
