package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — the MERGE sink that turns a change stream into
  * a queryable table: each micro-batch collapses to one change per key
  * (LAST wins, ordered by the stream's sequence column — CDC semantics),
  * then upserts/deletes against the current snapshot and publishes the
  * next one. Snapshots are immutable directories (the same discipline as
  * sources/Upsert) chained under the table root, with an atomic
  * `_current` pointer file (write-temp + rename) as the commit record —
  * the minimal table-format commit protocol.
  *
  * Exactly-once: batch b always reads its IMMUTABLE base snapshot
  * `v<b>` (derived from the batchId, never from the pointer — a replay
  * after a post-commit crash would otherwise read the already-advanced
  * pointer and overwrite the directory it is reading) and rewrites
  * `v<b+1>` from the same input — an idempotent re-commit, not a
  * duplicate apply. A batchId the chain cannot account for (a fresh
  * checkpoint against an old table) fails fast instead of silently
  * overwriting history: the checkpoint is PART of the table state.
  * Readers never see a half-written snapshot: the pointer moves only
  * after the parquet write completes, via an atomic rename-overwrite.
  *
  * Contract: the change stream carries the table columns plus `_op`
  * ('U' upsert / 'D' delete) and `_seq` (total order per key within a
  * batch). The caller seeds snapshot v0 + pointer via `init`.
  */
object CdcSink {

  private def pointerPath(root: String) = s"$root/_current"

  /** Seed the table: write `base` as snapshot v0 and point at it. */
  def init(base: DataFrame, root: String): Unit = {
    val snap = s"$root/v0"
    base.write.mode("overwrite").parquet(snap)
    commit(base.sparkSession, root, snap)
  }

  /** The snapshot the pointer currently names. */
  def currentSnapshot(spark: org.apache.spark.sql.SparkSession,
      root: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(pointerPath(root))
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Read the table as of the current commit. */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.parquet(currentSnapshot(spark, root))

  private def commit(spark: org.apache.spark.sql.SparkSession,
      root: String, snap: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_current.tmp")
    val dst = new org.apache.hadoop.fs.Path(pointerPath(root))
    val fs = tmp.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(snap.getBytes("UTF-8")) finally out.close()
    // rename WITH OVERWRITE is the atomic primitive on HDFS-like stores
    // (a delete-then-rename pair would leave a no-pointer window a
    // concurrent reader could fall into); on object stores a
    // conditional-put commit service takes this seam
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Apply one already-collapsed change batch (exposed for specs and
    * batch backfills): anti-join every changed key, union back the
    * non-deletes. */
  def applyBatch(current: DataFrame, changes: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_seq").desc)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    current.join(last.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(last.filter(col("_op") =!= "D").drop("_op", "_seq"))
  }

  /** One commit cycle for a (batchId, changes) pair — the foreachBatch
    * body, exposed so the replay-idempotence contract is directly
    * testable. base = the batch's own immutable predecessor, NOT the
    * pointer: on replay after a post-commit crash the pointer already
    * names v(b+1), and reading it while overwriting it is both wrong
    * and rejected by Spark. The pointer check catches a checkpoint that
    * doesn't belong to this table (fresh checkpoint, old chain). */
  def commitBatch(changes: DataFrame, root: String, keyCols: Seq[String],
      batchId: Long): Unit = {
    val spark = changes.sparkSession
    val base = s"$root/v$batchId"
    val ptr = currentSnapshot(spark, root)
    require(ptr == base || ptr == s"$root/v${batchId + 1}",
      s"checkpoint/table mismatch: batch $batchId but pointer at $ptr")
    val next = s"$root/v${batchId + 1}"
    applyBatch(spark.read.parquet(base), changes, keyCols)
      .write.mode("overwrite").parquet(next)
    commit(spark, root, next)
  }

  /** The streaming sink: foreachBatch → collapse → snapshot → commit.
    *
    * `checkpointLocation` is part of the table state (the batchId chain
    * that commitBatch verifies lives in it): pass a durable path
    * alongside the table root in production — the default temporary
    * checkpoint only protects replay within one process lifetime, which
    * is exactly the restart scenario CDC exists to survive (ADVICE r7).
    * Extra `options` pass through to the stream writer. */
  def apply(changes: DataFrame, root: String, keyCols: Seq[String],
      checkpointLocation: Option[String] = None,
      options: Map[String, String] = Map.empty): StreamingQuery = {
    val w0 = changes.writeStream
      .foreachBatch { (b: Dataset[Row], batchId: java.lang.Long) =>
        commitBatch(b.toDF(), root, keyCols, batchId)
      }
      .options(options)
    checkpointLocation.fold(w0)(p => w0.option("checkpointLocation", p))
      .start()
  }
}
