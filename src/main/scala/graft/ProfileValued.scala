package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The valued-probe discipline, as code (r17, VERDICT r16 #4).
  *
  * SCALE_r16 §6b finding 1: `count()`-based probes LIE about expression
  * cost. Column pruning (and nested-column pruning) drops any
  * deterministic projected expression a `count()` doesn't need, so
  * `df.select(expensiveExpr).count()` times the SCAN, not the
  * expression — at sfp100 that misattributed 60 s of per-row signature
  * cost to a candidate join whose own cost was < 1 s, and it hid a 73×
  * pathology until a valued probe exposed it. The r17 DupProbeSpec
  * rediscovered it live: a counting UDF under `count()` registered ZERO
  * evaluations.
  *
  * `timeValued` forces full per-row evaluation by aggregating a hash of
  * the probed columns — the aggregate consumes every row's value, so
  * nothing above it can prune the expression — and returns wall time
  * with the row count riding the same aggregate (no second job). Use it
  * for EVERY "what does this expression cost per row" question;
  * `timeCounted` exists only as the dishonest twin for divergence
  * demonstrations.
  */
object ProfileValued {

  /** (rows, seconds) with `cols` fully VALUED on every row. The hash
    * fold (max of xxhash64) is a few ns/row — negligible against any
    * expression worth profiling — and its result is returned so the JIT
    * cannot elide the evaluation either. */
  def timeValued(df: DataFrame, cols: Column*): (Long, Double) = {
    val t0 = System.nanoTime()
    val r = df.agg(count(lit(1)), max(xxhash64(cols: _*))).head()
    (r.getLong(0), (System.nanoTime() - t0) / 1e9)
  }

  /** (rows, seconds) via `count()` — the probe that PRUNES projected
    * expressions. Exists to measure the divergence, not to profile. */
  def timeCounted(df: DataFrame): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = df.count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  /** Valued per-row cost in nanoseconds — the audit's headline number. */
  def nsPerRow(df: DataFrame, cols: Column*): Double = {
    val (rows, sec) = timeValued(df, cols: _*)
    if (rows == 0) 0.0 else sec * 1e9 / rows.toDouble
  }
}
