package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of keyed ADDITIVE aggregates — the
  * materialized-view refresh path: at 100 TB you never re-aggregate the
  * corpus because a day of data landed; you merge the standing partial
  * state with the delta's partials. Correct exactly when every stored
  * measure is additive (count, sum, min/max under insert-only); derived
  * values that are NOT additive (avg, ratios) must be stored as their
  * additive parts and re-derived at read time — the classic
  * avg-of-avgs mistake, made unrepresentable here by construction.
  *
  * Shape: state ∪ delta → one map-side-combinable groupBy on the keys.
  * The shuffle carries one row per (side, key) — never raw data — so a
  * refresh costs O(|state keys| + |delta|), independent of corpus size.
  * Deletes/updates follow the same algebra with negated partials
  * (insert-only min/max excluded).
  */
object IncrementalAgg {

  /** Merge two partial frames sharing `keys` ++ additive measure columns:
    * sums for `sumCols`, mins/maxes for `minCols`/`maxCols`. */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val aggs: Seq[Column] =
      sumCols.map(c => sum(col(c)).as(c)) ++
        minCols.map(c => min(col(c)).as(c)) ++
        maxCols.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "refresh needs at least one measure column")
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
