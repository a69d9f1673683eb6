package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-joins for skewed or low-cardinality join keys.
  *
  * A shuffle join hashes rows by the join key: a key held by a large
  * fraction of the probe side lands that whole fraction in ONE task
  * (straggler / spill at best, OOM at worst). Broadcasting the build side
  * removes the shuffle but ships a full copy to every executor —
  * impossible once the build side is corpus-sized. Salting keeps the
  * shuffle but widens the key: the probe side adds a deterministic salt in
  * [0, salts), the build side replicates each row across every salt, and
  * the join key becomes (key, salt) — each hot key fans out over `salts`
  * tasks. Cost: build-side rows ×salts in the shuffle (linear, and the
  * build side is chosen as the smaller input), vs broadcast's ×executors
  * full copy.
  *
  * Every matching pair meets in exactly one bucket (the probe row's own
  * salt), so the result is row-for-row identical to the unsalted join —
  * the q_skew_join oracle pins this against a plain SQL join.
  *
  * AQE's OptimizeSkewedJoin handles the milder version of this at runtime
  * (splitting oversized post-shuffle partitions of sort-merge joins);
  * explicit salting is for keys so hot that even one key exceeds a task —
  * the two compose.
  *
  * In-tree consumers: graft.queries.Extended.multisetPairs and
  * graft.queries.Embeddings.cosineNearDup (blocked self-joins where the
  * block key has ~10 distinct values).
  */
object SkewJoin {

  /** Inner join of `probe` and `build` under `cond`, salted `salts` ways.
    *
    * `cond` must be a conjunction containing at least one equality between
    * a probe and a build column (so Catalyst plans a hash join on
    * (equi-keys, salt), not a nested loop); extra non-equi conjuncts
    * (e.g. `a_id < b_id` pair canonicalization) ride along as post-join
    * filters. `saltOn` is any deterministic probe-side expression — its
    * hash spreads the probe rows across salts; pass the probe's unique id
    * for a uniform spread.
    *
    * Column namespaces must already be disjoint (rename before calling, as
    * any self-join requires); the salt columns are dropped on the way out.
    */
  def salted(probe: DataFrame, build: DataFrame, cond: Column,
      saltOn: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // withColumn REPLACES an existing column of the same name — a caller
    // column named like our salt would be silently clobbered and the join
    // keyed on garbage, so fail fast instead.
    require(!probe.columns.contains("__salt"),
      "probe input already has a __salt column (reserved by SkewJoin)")
    require(!build.columns.contains("__b_salt"),
      "build input already has a __b_salt column (reserved by SkewJoin)")
    val p = probe.withColumn("__salt", pmod(xxhash64(saltOn), lit(salts)))
    val b = build.withColumn("__b_salt",
      explode(array((0 until salts).map(lit): _*)))
    p.join(b, cond && col("__salt") === col("__b_salt"))
      .drop("__salt", "__b_salt")
  }
}
