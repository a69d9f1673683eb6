package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Guard against destructive self-overwrites in the snapshot writers.
  *
  * Compaction, upsert and delete all read a parquet table lazily and write
  * the result with SaveMode.Overwrite. If the destination resolves to the
  * SAME location as the source, the overwrite deletes the input while the
  * scan is still reading it — irrecoverable table loss. Raw string
  * equality misses the equivalent-path forms (trailing slash, relative vs
  * absolute, scheme-qualified, symlink), so the check compares
  * fully-qualified Hadoop paths, following symlinks when the path exists.
  */
private[sources] object PathGuard {

  /** Fully-qualified (scheme + authority + absolute, symlinks resolved
    * when the path exists) form of `s` on its own filesystem.
    *
    * Local paths go through File.getCanonicalFile: Hadoop's
    * Raw/LocalFileSystem.resolvePath is getFileStatus().getPath() — it
    * does NOT follow symlinks, so a symlinked alias of the source would
    * slip past a resolvePath-only check. getCanonicalPath resolves
    * symlinks in every existing component (including parents of a
    * not-yet-created leaf). */
  private def canonical(spark: SparkSession, s: String): Path = {
    val p = new Path(s)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(p)
    if (q.toUri.getScheme == "file")
      new Path("file", null,
        new java.io.File(q.toUri.getPath).getCanonicalPath)
    else
      try fs.resolvePath(q)  // symlink-aware on HDFS; throws if absent
      catch { case _: java.io.IOException => q }
  }

  /** Fail fast when `dest` resolves to the same location as `src`. */
  def requireDistinct(spark: SparkSession, src: String, dest: String,
      what: String): Unit = {
    val (s, d) = (canonical(spark, src), canonical(spark, dest))
    require(s != d,
      s"$what must write to a new location: source and destination both " +
        s"resolve to $s (a self-overwrite would delete the input mid-scan)")
  }
}
