package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call stale-on-rewrite hook for every session-memoized cache in
  * the engine (ADVICE r15: QualityFilter lacked the hook and nothing
  * tied the per-object hooks together). Long-lived JVMs that rewrite a
  * corpus dir in place call this once; each object's own
  * invalidateCache stays callable individually for scoped refreshes.
  */
object Caches {

  /** Materialize a session-scoped shared frame AND CUT ITS LINEAGE
    * (eager localCheckpoint). A persist()'d frame keeps its whole
    * production pipeline reachable for recompute-on-eviction, which
    * PINS every upstream shuffle file on disk for the cache's lifetime
    * — the ContextCleaner can never reclaim them. At the sixth measured
    * decade (sfp100) the pinned floor under the heavy pair-join block
    * reached ~23 GB and the full 149-query suite died on `No space left
    * on device` (SCALE_r17 §6). localCheckpoint stores the materialized
    * partitions (MEMORY_AND_DISK) and DROPS the plan, so production
    * shuffles are reclaimed at the next GC and the steady-state
    * footprint is the frame itself, not its pipeline.
    *
    * Trade-off, stated: a checkpointed frame is NOT recomputable — on a
    * multi-node cluster an executor loss fails the consumer job instead
    * of recomputing the lost partitions (there you'd reliable-
    * `checkpoint()` to the cluster FS; same lineage cut, fault-tolerant
    * storage). At local[*] there is no executor loss.
    *
    * Invalidation contract: dropping the TrieMap reference orphans the
    * checkpointed RDD and the ContextCleaner unpersists its blocks
    * after the next GC; the pre-existing `unpersist(blocking=false)`
    * calls in each invalidateCache are harmless no-ops on a
    * checkpointed frame. */
  def pin(df: DataFrame): DataFrame = df.localCheckpoint()

  def invalidate(s: SparkSession): Unit = {
    queries.Extended.invalidateCache(s)
    queries.TextAnalysis.invalidateCache(s)
    queries.Embeddings.invalidateCache(s)
    queries.GraphQueries.invalidateCache(s)
    ml.QualityFilter.invalidateCache(s)
    // DupProbe's memo is not just a cost router anymore (ADVICE r16):
    // since r16 its (count, dupFactor) feeds the analytic safety gates
    // (lshNearDupPairs' nEff, lshTopK's rerank-mass estimate), so a
    // stale entry after an in-place dir rewrite could admit a plan the
    // gate exists to block. It must ride the one-call hook.
    operators.DupProbe.invalidate(s)
  }
}
