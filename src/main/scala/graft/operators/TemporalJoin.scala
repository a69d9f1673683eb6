package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks (SURVEY.md §2.3 "not
  * present": as-of / range / interval joins) — first-class citizens of any
  * event-log or feature-store pipeline, built scale-first:
  *
  *  - `asOf`: MERGE-like "latest right row at or before each left row's
  *    timestamp". NOT implemented as a range join (a per-left-row probe is
  *    quadratic in the worst case and Spark would plan the inequality as a
  *    broadcast-nested-loop); instead union the two sides, sort within each
  *    key partition, and carry the last right payload forward with a
  *    running window — ONE shuffle on the key, O(n log n) per key, the
  *    plan a stream-processing engine would use.
  *  - `timeRangePairs`: all same-key row pairs within a bounded time gap.
  *    Bucketing the timeline into gap-sized cells turns the inequality
  *    into an equi-join on (key, cell) — each pair meets in exactly one
  *    cell, the shuffle key has high cardinality, and no cross product
  *    exists anywhere. Skew bound: a cell holds at most the rows of one
  *    gap window, so hot keys degrade linearly, not quadratically.
  */
object TemporalJoin {

  /** As-of join: attach to each left row the payload of the single most
    * recent right row with `right.tsCol <= left.tsCol` in the same key
    * group (null struct fields when no such row exists).
    *
    * Ties: right rows sharing the exact timestamp are ordered by
    * `tieBreak`; the largest wins. Right rows sort before left rows at
    * equal timestamps, so a right row at exactly `left.ts` IS visible
    * (inclusive as-of, DuckDB `ASOF JOIN` semantics).
    *
    * @param left        probe side; all columns preserved
    * @param right       build side: key columns ++ tsCol ++ payload
    * @param keys        equi-join key columns (present on both sides)
    * @param tsCol       orderable event-time column (present on both sides)
    * @param payloadCols right columns to attach (must not clash with left)
    * @param tieBreak    right column ordering same-timestamp rows
    *
    * Scale: one hash shuffle on `keys`, one per-partition sort — no range
    * join, no broadcast. A pathologically hot key serializes into one
    * task; shard such keys by coarse time chunk upstream (carrying each
    * chunk's last right row into the next chunk) if needed.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String], tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right payload travels as ONE non-null struct so `last(_, ignoreNulls)`
    // treats the whole row atomically — individual payload columns may be
    // legitimately null without the window skipping back past the row.
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol),
        struct(payloadCols.map(col): _*).as("__p"),
        col(tieBreak).as("__tb"),
        lit(0).as("__side")): _*)
    val l = left.select(
      col("*"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      lit(null).cast(r.schema("__tb").dataType).as("__tb"),
      lit(1).as("__side"))
    // unionByName with missing left-only columns nulled on the right side
    val unioned = l.unionByName(
      r.select((leftCols.map(c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__p"), col("__tb"), col("__side"))): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(leftCols.map(col) ++
      payloadCols.map(p => col(s"__last.$p").as(p)): _*)
  }

  /** Ordered same-key row pairs within `maxGapUs` microseconds:
    * (a, b) with a before b (timestamp, then `idCol` for exact ties) and
    * `0 <= b.ts - a.ts <= maxGapUs`. Emits keys ++ (a_id, b_id, gap_us).
    *
    * The timeline is cut into maxGapUs-sized cells; any qualifying pair
    * spans at most one cell boundary, so joining a's cell and cell+1
    * against b's cell finds every pair exactly once (no dedup needed:
    * the two probe cells are distinct, and b lives in exactly one).
    *
    * @param df       input rows
    * @param keys     blocking key columns (pairs never cross keys)
    * @param tsUsCol  event time in integer microseconds
    * @param idCol    unique orderable row id (tie-break + output)
    */
  def timeRangePairs(df: DataFrame, keys: Seq[String], tsUsCol: String,
      idCol: String, maxGapUs: Long): DataFrame = {
    require(maxGapUs > 0, s"maxGapUs must be positive: $maxGapUs")
    // exact integer floor-division (µs magnitudes would round under a
    // double divide at extreme scales; DIV never does)
    val cell = expr(s"`$tsUsCol` DIV ${maxGapUs}L")
    val slim = df.select(
      keys.map(col) ++ Seq(col(idCol), col(tsUsCol)): _*)
    val a = slim.select(
      keys.map(col) ++ Seq(
        col(idCol).as("a_id"), col(tsUsCol).as("a_ts"),
        explode(array(cell, cell + 1)).as("__cell")): _*)
    val b = slim.select(
      keys.map(c => col(c).as(s"__b_$c")) ++ Seq(
        col(idCol).as("b_id"), col(tsUsCol).as("b_ts"),
        cell.as("__b_cell")): _*)
    val joinCond = keys.map(c => col(c) === col(s"__b_$c"))
      .reduce(_ && _) && col("__cell") === col("__b_cell")
    a.join(b, joinCond)
      .filter(
        (col("b_ts") > col("a_ts") ||
          (col("b_ts") === col("a_ts") && col("b_id") > col("a_id"))) &&
        col("b_ts") - col("a_ts") <= maxGapUs)
      .select(keys.map(col) ++ Seq(col("a_id"), col("b_id"),
        (col("b_ts") - col("a_ts")).as("gap_us")): _*)
  }

  /** Convenience: integer-µs division helper for timestamp columns. */
  def tsUs(ts: Column): Column = unix_micros(ts)
}
