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
  }
}
