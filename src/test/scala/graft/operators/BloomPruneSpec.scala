package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom pre-join pruning: identity with the plain join (no false
  * negatives), actual pruning on disjoint keys, and the empty-build
  * edge case. */
class BloomPruneSpec extends SparkSpec {

  test("pruned join equals plain join, including duplicate keys") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(11)
    val probe = Seq.tabulate(2000)(i => (i.toLong, rnd.nextInt(300).toLong))
      .toDF("p_id", "p_key")
    val build = Seq.tabulate(80)(j => (rnd.nextInt(300).toLong, s"v$j"))
      .toDF("b_key", "v")
    val plain = probe.join(build, $"p_key" === $"b_key")
      .select($"p_id", $"v").collect().map(r => (r.getLong(0), r.getString(1)))
    val pruned = BloomPrune.prunedInnerJoin(probe, build,
        $"p_key" === $"b_key", $"p_key", $"b_key", expectedItems = 1000)
      .select($"p_id", $"v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(pruned.sorted.toSeq === plain.sorted.toSeq)
  }

  test("disjoint keys are pruned before the join") {
    val spark2 = spark
    import spark2.implicits._
    val probe = (1L to 5000L).toDF("p_key")
    val build = (100000L to 100050L).toDF("b_key")
    val bytes = BloomPrune.sketch(build, $"b_key", expectedItems = 1000)
    val survivors = probe.filter(BloomPrune.mightContain(bytes, $"p_key")).count()
    // default fpp 3%: expect ~150 of 5000 survivors; 10% is a loose bound
    assert(survivors < 500, s"bloom pruned only to $survivors of 5000")
    assert(BloomPrune.prunedInnerJoin(probe, build, $"p_key" === $"b_key",
      $"p_key", $"b_key", 1000).count() === 0L)
  }

  test("empty build side yields an empty join") {
    val spark2 = spark
    import spark2.implicits._
    val probe = (1L to 10L).toDF("p_key")
    val build = probe.filter(lit(false)).withColumnRenamed("p_key", "b_key")
    assert(BloomPrune.prunedInnerJoin(probe, build, $"p_key" === $"b_key",
      $"p_key", $"b_key").count() === 0L)
  }
}
