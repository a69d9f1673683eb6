package graft

import org.apache.spark.sql.SparkSession

/** One-call stale-on-rewrite hook for every session-memoized cache in
  * the engine (ADVICE r15: QualityFilter lacked the hook and nothing
  * tied the per-object hooks together). Long-lived JVMs that rewrite a
  * corpus dir in place call this once; each object's own
  * invalidateCache stays callable individually for scoped refreshes.
  */
object Caches {
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
