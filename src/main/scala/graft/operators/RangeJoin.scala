package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-decomposed range (point-in-interval) join.
  *
  * Spark plans a bare `p >= lo AND p < hi` join as BroadcastNestedLoopJoin
  * (O(|points| × |intervals|) comparisons, and the intervals side must fit
  * in a broadcast). That dies exactly when range joins matter: joining a
  * corpus-sized point table against a large interval table (IP→geo ranges,
  * time-validity dimensions, price tiers from a feed).
  *
  * Bucketing turns it into an equi-join: pick a bucket width w, map each
  * point to bucket floor(p/w), explode each interval into every bucket it
  * overlaps (floor(lo/w) … floor(hi/w)), hash-join on the bucket id, and
  * re-check the exact predicate. Interval replication is
  * ceil(span/w) + 1 ≈ span/w rows — linear in the interval table for any
  * w on the order of the median span — and the join is a plain shuffled
  * (or AQE-broadcast) hash join that scales out like any other equi-join.
  * Same technique as Databricks' range-join bin optimization, built here
  * from explode + join so it works on stock Spark.
  *
  * Width trade-off: too small → interval replication blows up; too large →
  * each bucket pairs points with intervals they miss and the residual
  * filter does the work. A width near the median interval span keeps both
  * linear. */
object RangeJoin {

  /** Join each `points` row to every `intervals` row whose half-open
    * [loCol, hiCol) interval contains `pointCol`. Column namespaces must
    * be disjoint; the result carries all columns of both inputs.
    *
    * Exactness: a point in [lo, hi) has floor(p/w) within
    * [floor(lo/w), floor(hi/w)], so its interval's explosion always
    * includes the point's bucket — no candidate is missed; the residual
    * predicate removes same-bucket non-matches. Oracle-pinned against a
    * plain inequality join (q_price_bands) and property-tested against
    * the naive theta join (RangeJoinSpec). */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // withColumn silently replaces a same-named caller column — fail fast
    require(!points.columns.contains("__bucket") &&
        !intervals.columns.contains("__bucket"),
      "inputs already have a __bucket column (reserved by RangeJoin)")
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucket(col(pointCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
