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
  * combining this with PartitionedLayout — `mergePartitioned` rewrites
  * only partitions containing matched or inserted keys and moves every
  * other partition's files by reference (hard link on a local fs, byte
  * copy elsewhere), so merge cost tracks the TOUCHED data, not the table.
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

  /** Partition-scoped MERGE into a hive-partitioned snapshot
    * (PartitionedLayout.writePartitioned's directory scheme): only the
    * partitions that actually change are rewritten through Spark; every
    * untouched partition's files move into the new snapshot BY REFERENCE
    * (hard link when source and destination share a local filesystem,
    * byte-for-byte copy otherwise). At 100 TB with date/lang-partitioned
    * corpora and incremental recrawls, touched partitions are a small
    * fraction of the table — this is the difference between a merge that
    * costs O(delta) and one that rewrites 100 TB.
    *
    * A partition is touched when an update row lands in it, OR when a
    * base row whose key matches an update lives in it (a key may move
    * partitions: its old partition must rewrite to drop the stale row).
    * Finding the latter costs one column-pruned scan of (key, partition)
    * columns — footer-level column pruning makes that cheap next to any
    * rewrite.
    *
    * `partCols` must be exactly the snapshot's partition columns, in
    * nesting order; updates must carry them non-null. Same key
    * preconditions as `upsertSnapshot`.
    *
    * @return relative paths of the rewritten (touched) partitions */
  def mergePartitioned(spark: SparkSession, basePath: String,
      updates: DataFrame, keyCols: Seq[String], partCols: Seq[String],
      destPath: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    PathGuard.requireDistinct(spark, basePath, destPath, "merge")
    require(partCols.nonEmpty, "mergePartitioned needs partition columns")
    require(keyCols.nonEmpty, "mergePartitioned needs key columns")
    requireSoundKeys(updates, keyCols)
    val nullParts = updates
      .filter(partCols.map(updates.col(_).isNull).reduce(_ || _)).count()
    require(nullParts == 0,
      s"$nullParts update rows have null partition values in " +
        s"(${partCols.mkString(", ")}) — null partitions are not supported")

    // resolve BOTH filesystems before any write, so a cross-fs or
    // misconfigured destination fails fast instead of after the Spark
    // rewrite (which would leave a half-written destination snapshot)
    val conf = spark.sparkContext.hadoopConfiguration
    val srcRoot = new org.apache.hadoop.fs.Path(basePath)
    val srcFs = srcRoot.getFileSystem(conf)
    val destRootRaw = new org.apache.hadoop.fs.Path(destPath)
    val destFs = destRootRaw.getFileSystem(conf)
    val destRoot = destFs.makeQualified(destRootRaw)

    // Partition values are compared AS DIRECTORY STRINGS: type inference
    // on the base read would round-trip lossily (month=01 inferred as
    // int 1 renders back as month=1 — a silent partition rename/split),
    // so it is scoped off and partition columns come back as the exact
    // unescaped directory values. Update-side partition columns coerce
    // to string through unionByName below; callers own matching their
    // string forms to the layout (the common always-string case is
    // exact by construction).
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferWas = spark.conf.get(inferKey)
    val base =
      try { spark.conf.set(inferKey, "false"); spark.read.parquet(basePath) }
      finally spark.conf.set(inferKey, inferWas)

    // touched = partitions receiving update rows ∪ partitions holding a
    // matched key (the semi-join scan reads only key+partition columns)
    val strParts = (df: DataFrame) =>
      df.select(partCols.map(c => df.col(c).cast("string").as(c)): _*)
        .distinct()
    val updKeys = updates.select(keyCols.map(updates.col): _*)
      .dropDuplicates(keyCols)
    val touched = strParts(updates)
      .unionByName(strParts(base.join(updKeys, keyCols, "left_semi")))
      .distinct().collect()
    // a matched key inside a null-valued base partition cannot be
    // rewritten by value equality — fail rather than silently keep the
    // stale row (null partitions are rejected on the update side above)
    require(touched.forall(r => !r.anyNull),
      "a matched key lives in a null-valued base partition " +
        "(__HIVE_DEFAULT_PARTITION__) — null partitions are not supported")

    // rewrite ONLY the touched partitions. Few partitions → a literal
    // OR-of-ANDs predicate (static partition pruning, no scan outside
    // the touched dirs); many → a broadcast semi-join against the
    // touched set (a 10k-term literal disjunction chokes Catalyst;
    // dynamic partition pruning handles the join form at scale).
    val touchedBase =
      if (touched.length <= 64) {
        val pred = touched.map(r =>
            partCols.zipWithIndex.map { case (c, i) =>
              col(c).cast("string") === lit(r.getString(i)) }
              .reduce(_ && _))
          .reduceOption(_ || _).getOrElse(lit(false))
        base.filter(pred)
      } else {
        val touchedDf = spark.createDataFrame(
          spark.sparkContext.parallelize(touched.toSeq, 1),
          org.apache.spark.sql.types.StructType(partCols.map(c =>
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType))))
        base.join(broadcast(touchedDf), partCols, "left_semi")
      }
    upsert(touchedBase, updates, keyCols)
      .repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(destPath)

    // move every untouched partition by reference
    val touchedRel = touched.map(partRelPath(partCols, _)).toSet
    for (dir <- leafPartitionDirs(srcFs, srcRoot, partCols)
         if !touchedRel.contains(dir)) {
      val from = new org.apache.hadoop.fs.Path(srcRoot, dir)
      val to = new org.apache.hadoop.fs.Path(destRoot, dir)
      destFs.mkdirs(to)
      for (st <- srcFs.listStatus(from) if st.isFile
           && !st.getPath.getName.startsWith("_")
           && !st.getPath.getName.startsWith(".")) {
        linkOrCopy(srcFs, destFs, conf, st.getPath,
          new org.apache.hadoop.fs.Path(to, st.getPath.getName))
      }
    }
    touchedRel.toSeq.sorted
  }

  /** Directory segment path for one partition-value row, using Spark's
    * own hive-path escaping so it matches what the writer produced. */
  private def partRelPath(partCols: Seq[String],
      r: org.apache.spark.sql.Row): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    partCols.zipWithIndex.map { case (c, i) =>
      ExternalCatalogUtils.escapePathName(c) + "=" +
        ExternalCatalogUtils.escapePathName(String.valueOf(r.get(i)))
    }.mkString("/")
  }

  /** Relative paths of the base snapshot's leaf partition directories,
    * validating the directory tree really is partitioned by `partCols`
    * (a mispartitioned base would otherwise silently drop data from the
    * merged snapshot). */
  private def leafPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, partCols: Seq[String]): Seq[String] = {
    def level(dir: org.apache.hadoop.fs.Path, depth: Int): Seq[String] = {
      if (depth == partCols.size) return Seq("")
      val prefix = partCols(depth) + "="
      fs.listStatus(dir).toSeq
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
        .flatMap { st =>
          require(st.isDirectory && st.getPath.getName.startsWith(prefix),
            s"base snapshot is not partitioned by " +
              s"(${partCols.mkString(", ")}): found ${st.getPath}")
          level(st.getPath, depth + 1)
            .map(rest => st.getPath.getName +
              (if (rest.isEmpty) "" else s"/$rest"))
        }
    }
    level(root, 0)
  }

  /** Hard link when BOTH ends are on a local filesystem (free, and the
    * test of reference-moving is byte identity), stream copy otherwise
    * (cross-fs moves, object stores, HDFS without hard links; a real
    * catalog would move the manifest pointer instead). */
  private def linkOrCopy(srcFs: org.apache.hadoop.fs.FileSystem,
      destFs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path): Unit = {
    val bothLocal = srcFs.makeQualified(from).toUri.getScheme == "file" &&
      destFs.makeQualified(to).toUri.getScheme == "file"
    if (bothLocal) {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(destFs.makeQualified(to).toUri.getPath),
        java.nio.file.Paths.get(srcFs.makeQualified(from).toUri.getPath))
    } else {
      org.apache.hadoop.fs.FileUtil.copy(srcFs, from, destFs, to,
        /* deleteSource = */ false, /* overwrite = */ false, conf)
    }
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
