package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout — Bucketing's sibling: bucketing
  * eliminates join shuffles, directory partitioning eliminates SCANS.
  * A table written `partitionBy(date)` prunes untouched partitions at
  * PLANNING time (the scan's PartitionFilters), so a one-day query over a
  * year of 100 TB reads ~0.3% of the files — the single biggest lever for
  * time-ranged queries, and free to combine with bucketing within each
  * partition.
  *
  * Rules of use at scale:
  *  - partition on low-cardinality, always-filtered columns (event date,
  *    source, lang); NEVER on high-cardinality keys (user_id) — millions
  *    of tiny directories kill the file listing, not the scan;
  *  - repartition by the partition column before writing, or every task
  *    writes a file into every partition (tasks × partitions small files);
  *  - filters must be on the partition column itself — a filter through a
  *    function of it (unless it folds) scans everything.
  */
object PartitionedLayout {

  /** Write `df` partitioned by `cols` (directory per value combination).
    * The pre-shuffle on the partition columns keeps output to ~one file
    * per partition instead of one per task per partition. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Read back a partitioned table (partition columns are reconstructed
    * from directory names by the parquet source). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
