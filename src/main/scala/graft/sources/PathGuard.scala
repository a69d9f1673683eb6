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
    * when the path exists) form of `s` on its own filesystem. */
  private def canonical(spark: SparkSession, s: String): Path = {
    val p = new Path(s)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(p)
    try fs.resolvePath(q)  // resolves symlinks; throws if q doesn't exist
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
