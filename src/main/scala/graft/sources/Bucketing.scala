package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout: the shuffle-elimination tool for 100 TB jobs.
  *
  * A table written with `bucketBy(n, key)` is hash-partitioned on disk into
  * n buckets per directory. Joins and aggregations on the bucket key then
  * read co-located: Catalyst proves both sides share the required
  * distribution and plans a sort-merge join with NO Exchange on either
  * side — the single biggest cost in a repeated big-big join pipeline
  * (e.g. lineitem ⋈ orders every run) disappears. The reference has no
  * storage layout at all (flat CSV/text scans, SURVEY.md §2.1); this is
  * the engine-side capability a warehouse deployment would add first.
  *
  * Rules of use at scale:
  *  - both join sides must be bucketed on the join key with equal (or
  *    integer-multiple) bucket counts;
  *  - pre-sorting within buckets (`sortBy`) additionally removes the
  *    per-task sort of the SMJ;
  *  - bucket count should target ~100-500 MB per bucket file at the
  *    expected table size — too few buckets caps parallelism, too many
  *    makes small files.
  *
  * Verified by BucketingSpec: the bucketed join plan contains no shuffle.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed parquet
    * table. Overwrites any existing table of the same name. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Inner equi-join of two registered bucketed tables on their common
    * bucket key. With matching bucket counts this plans shuffle-free. */
  def bucketJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
