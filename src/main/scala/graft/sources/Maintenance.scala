package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet table maintenance — the operational half of a 100 TB layout
  * story (Bucketing/PartitionedLayout/ZOrder are the write-side half).
  *
  *  - Compaction: streaming and incremental jobs leave thousands of
  *    KB-sized files per partition; scan cost then tracks FILE COUNT
  *    (open/footer/seek per file), not bytes. Rewriting to ~target-sized
  *    files restores scan throughput and is idempotent.
  *  - Schema evolution: long-lived corpora gain columns over time. Parquet
  *    needs no rewrite — old files simply lack the new column groups —
  *    but the READ must union schemas (`mergeSchema`), which Spark leaves
  *    off by default because footer-merging every file is a planning cost.
  *    Evolved tables should turn it on explicitly (or pin a user schema).
  */
object Maintenance {

  /** Rewrite `path` with ~`targetFileBytes`-sized files: file count is
    * computed from the table's actual on-disk bytes, so compaction of a
    * 100 TB table yields ~100 TB / target files regardless of how
    * fragmented the input was. Round-robin repartition — no shuffle key
    * needed; within-file clustering, if wanted, is ZOrder.cluster's job
    * before the write. Writes to `dest` (a self-overwrite would delete
    * the input mid-scan). */
  def compact(spark: SparkSession, path: String, dest: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    PathGuard.requireDistinct(spark, path, dest, "compact")
    val bytes = inputBytes(spark, path)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(dest)
  }

  /** Total bytes of the table's data files (driver-side listing — the
    * same information a catalog would hold). */
  def inputBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(dir).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) 0L
        else st.getLen
      }.sum
    walk(p)
  }

  /** Read an evolved table: union the schemas of all files, null-filling
    * columns absent from older files. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
