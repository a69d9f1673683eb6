package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Copy-on-write MERGE for parquet snapshots — the refresh operation of a
  * living training corpus (recrawled documents replace stale rows, new
  * documents append, takedowns delete) without a table format.
  *
  * Semantics are Delta/Iceberg's MERGE WHEN MATCHED THEN UPDATE / WHEN NOT
  * MATCHED THEN INSERT, expressed as the classic two-op dataflow:
  * anti-join the base against the update keys (drops matched rows), then
  * union the updates. One shuffle on the key; at 100 TB the win is
  * combining this with PartitionedLayout — only partitions containing
  * matched keys need rewriting, the rest move by reference (a catalog's
  * job; here the whole snapshot rewrites, which is exactly what
  * copy-on-write formats do per-file).
  *
  * Writes to a NEW snapshot directory: readers of the old snapshot are
  * never disturbed, and a failed job leaves no half-written table —
  * swap-on-success is the caller's (or catalog's) pointer update.
  */
object Upsert {

  /** Base ∖ keys(updates) ∪ updates. Schemas must match by name
    * (unionByName, so column order is free).
    *
    * PRECONDITIONS (this is a lazy plan builder, so callers own them;
    * `upsertSnapshot` enforces both in one agg pass):
    *  - update keys are unique — duplicate keys in `updates` would both
    *    land in the merged result (the anti-join removes the base row
    *    once, the union appends every update row), silently corrupting
    *    key uniqueness (Delta/Iceberg MERGE likewise errors on multiple
    *    matches);
    *  - update keys are non-null — a null key never matches the anti-join
    *    (SQL null-equality), so a null-key update row always APPENDS
    *    rather than replaces. */
  def upsert(base: DataFrame, updates: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    base.join(
        updates.select(keyCols.map(updates.col): _*).dropDuplicates(keyCols),
        keyCols, "left_anti")
      .unionByName(updates)
  }

  /** Upsert `updates` into the snapshot at `basePath`, writing `destPath`.
    * Rejects null and duplicate update keys (one cheap agg over the update
    * frame — always small next to the snapshot rewrite). */
  def upsertSnapshot(spark: SparkSession, basePath: String,
      updates: DataFrame, keyCols: Seq[String], destPath: String): Unit = {
    PathGuard.requireDistinct(spark, basePath, destPath, "upsert")
    requireSoundKeys(updates, keyCols)
    upsert(spark.read.parquet(basePath), updates, keyCols)
      .write.mode(SaveMode.Overwrite).parquet(destPath)
  }

  /** One agg pass over `updates` checking both key preconditions, with
    * failures that name the real problem (countDistinct alone skips nulls,
    * so a null key used to surface as a confusing count mismatch). */
  private def requireSoundKeys(updates: DataFrame,
      keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val anyNull = keyCols.map(updates.col(_).isNull).reduce(_ || _)
    val Array(total, distinct, nulls) = updates
      .select(count(lit(1)), countDistinct(keyCols.head, keyCols.tail: _*),
        count(when(anyNull, 1)))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    require(nulls == 0,
      s"null key values in updates: $nulls of $total rows have a null in " +
        s"(${keyCols.mkString(", ")}) — a null key never matches the " +
        "anti-join, so the row would silently append instead of replace")
    require(total == distinct,
      s"duplicate keys in updates: $total rows, $distinct distinct keys " +
        s"on (${keyCols.mkString(", ")})")
  }

  /** Anti-delete: drop rows matching `predicate` (takedown/expiry),
    * writing a new snapshot. */
  def deleteWhere(spark: SparkSession, basePath: String,
      predicate: Column, destPath: String): Unit = {
    PathGuard.requireDistinct(spark, basePath, destPath, "delete")
    spark.read.parquet(basePath).filter(!predicate)
      .write.mode(SaveMode.Overwrite).parquet(destPath)
  }
}
