package graft

import org.apache.spark.sql.execution.ExternalRDD
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Caches.pin — the lineage-cut contract behind every session-scoped
  * materialized frame (SCALE_r17 §6: a persist()'d shared frame pins
  * its whole production pipeline's shuffle files on disk for the
  * cache's lifetime; the sfp100 full suite died on the accumulated
  * floor). pin() must (1) preserve the rows bit-for-bit and (2)
  * actually CUT the lineage — the returned plan is a materialized-scan
  * leaf, not the producing pipeline. */
class CachesPinSpec extends SparkSpec {
  import spark.implicits._

  private def producer = {
    // a real shuffle-producing pipeline (groupBy + join), so a retained
    // lineage would reference two ShuffleDependencies
    val base = spark.range(1000).select(
      (col("id") % 37).as("k"), col("id").as("v"))
    val agg = base.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    agg.join(base.groupBy($"k").agg(max($"v").as("m")), "k")
  }

  test("pin preserves rows exactly") {
    val expected = producer.collect().map(_.toSeq).toSet
    val got = Caches.pin(producer).collect().map(_.toSeq).toSet
    assert(got === expected)
    assert(Caches.pin(producer).schema === producer.schema)
  }

  test("pin cuts lineage: the plan is a materialized leaf, not the " +
      "producing pipeline (shuffle files become ContextCleaner-eligible)") {
    val pinned = Caches.pin(producer)
    val leaf = pinned.queryExecution.analyzed
    assert(leaf.isInstanceOf[LogicalRDD] || leaf.isInstanceOf[ExternalRDD[_]],
      s"expected a checkpoint-scan leaf, got:\n${leaf.treeString}")
    // and no Exchange survives in the physical plan of a pinned scan
    val phys = pinned.queryExecution.executedPlan.toString()
    assert(!phys.contains("Exchange"),
      s"pinned frame's physical plan still shuffles:\n$phys")
  }
}
