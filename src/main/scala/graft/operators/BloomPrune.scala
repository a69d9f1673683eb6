package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-join pruning — the semi-join pushdown pattern.
  *
  * A large-probe ⋈ selective-build join shuffles the ENTIRE probe side,
  * then discards most of it at the join. When the build side's key set is
  * small but not literal-broadcast-small, the scalable fix is a Bloom
  * sketch: aggregate the build keys into a fixed-size filter (a
  * distributed TypedImperativeAggregate — partial sketches built per
  * partition, OR-merged), embed the sketch bytes as a literal in a probe-
  * side filter, and only then join. The probe filter runs inside the scan
  * stage — pruned rows never reach the shuffle. This is exactly what
  * Spark's own runtime row-level filtering (InjectRuntimeFilter) does for
  * qualifying shuffle joins; this operator makes the pattern explicit,
  * composable (e.g. ahead of an aggregation or a salted join), and
  * independent of the optimizer's eligibility rules.
  *
  * Correctness: a Bloom filter has NO false negatives, so every probe row
  * with a matching build key survives the prune; false positives (rate set
  * by `expectedItems` sizing) are eliminated by the exact join that
  * follows. The q_bloom_prune oracle pins identity with the plain SQL
  * join. Null probe keys hash to the seed value and may survive the
  * prune, but `===` never matches null — identity holds for standard
  * equi-joins (don't use with `<=>` null-matching semantics).
  *
  * Scale: the sketch is O(expectedItems) bits regardless of data size
  * (1M keys ≈ 1.2 MB at the default fpp), vs collecting the key set
  * (unbounded) or broadcasting the build table (×executors copies).
  */
object BloomPrune {

  /** Distributed Bloom sketch of `key` over `build`. Returns null when
    * `build` is empty. */
  def sketch(build: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(key)), expectedItems)
    val bytes = build
      .select(GraftBridge.column(agg.toAggregateExpression()).as("bf"))
      .head.get(0)
    bytes.asInstanceOf[Array[Byte]]
  }

  /** Probe-side membership test against sketch bytes (codegen'd native
    * expression; the sketch rides into tasks as a plan literal). */
  def mightContain(sketchBytes: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(sketchBytes, BinaryType),
      GraftBridge.expression(xxhash64(key))))

  /** `probe ⋈ build` on `cond`, with the probe side Bloom-pruned on
    * (probeKey, buildKey) before the shuffle. Size `expectedItems` at or
    * above the build-side key cardinality — undersizing only raises the
    * false-positive rate (more surviving non-matches), never drops rows. */
  def prunedInnerJoin(probe: DataFrame, build: DataFrame, cond: Column,
      probeKey: Column, buildKey: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    val bytes = sketch(build, buildKey, expectedItems)
    // empty build side → no sketch; the inner join is empty regardless
    val pruned =
      if (bytes == null) probe.filter(lit(false))
      else probe.filter(mightContain(bytes, probeKey))
    pruned.join(build, cond)
  }
}
