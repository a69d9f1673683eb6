package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data-skipping index — the statistics tier of a
  * Delta/Iceberg-style table format, as a first-class operator: one
  * index row per data file carrying per-column min/max (+ null/row
  * counts), and a reader that consults the index FIRST and hands Spark
  * only the files whose ranges can possibly match. Parquet footers give
  * row-group skipping inside a file that is already being read; this
  * index removes whole files from the listing before any scan task is
  * planned — at 100 TB the difference between "open every footer" and
  * "read a KB-scale index".
  *
  * Pairs with ZOrder.cluster: clustering is what makes per-file ranges
  * TIGHT (a random layout has every file spanning the whole domain and
  * nothing skips); the index is the mechanism that turns tight ranges
  * into skipped files. ZOrderSpec pins the tightness, SkippingIndexSpec
  * pins identical results + fewer files scanned.
  *
  * Contract: the index describes an immutable snapshot directory (the
  * same snapshot discipline as Upsert); rebuild after compaction or
  * MERGE. Pruning is CONSERVATIVE: a file with null stats (all-null
  * column) or a file absent from the index is kept, never skipped, so a
  * stale-but-superset listing degrades to extra IO, not wrong answers.
  * The final filter is always re-applied by Spark — the index only
  * shrinks the file list, it never asserts row-level truth.
  */
object SkippingIndex {

  /** Build the index frame for `cols` of the parquet table at `path`:
    * one row per physical file — (file, n_rows, and per column c:
    * c_min, c_max, c_nulls). One distributed pass, map-side combinable
    * agg keyed by file name; output is #files rows (KB-scale — small
    * enough to broadcast, collect, or store next to the snapshot). */
  def build(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one indexed column")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(col(c).isNull.cast("long")).as(s"${c}_nulls"))
    }
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** The files an interval predicate `lo <= c <= hi` cannot rule out:
    * keep when [c_min, c_max] intersects [lo, hi], or when the stats are
    * null (all-null or unknown — conservative). Driver-side: the index
    * is #files rows. */
  def candidateFiles(index: DataFrame, c: String, lo: Any,
      hi: Any): Seq[String] = {
    val keep: Column = col(s"${c}_min").isNull || col(s"${c}_max").isNull ||
      !(col(s"${c}_max") < lit(lo) || col(s"${c}_min") > lit(hi))
    index.filter(keep).select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Read only the files the index cannot rule out for `lo <= c <= hi`,
    * then re-apply the predicate (the index shrinks IO; Spark keeps
    * row-level correctness). An empty candidate list yields an empty
    * frame with the table's schema. */
  def prunedRead(spark: SparkSession, path: String, index: DataFrame,
      c: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(index, c, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }
}
