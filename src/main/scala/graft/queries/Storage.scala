package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver-visible evidence queries for the storage/streaming families
  * that were previously spec-only (VERDICT r7 #2/#3): a deterministic
  * Structured-Streaming replay through the CDC MERGE sink, a COW MERGE
  * snapshot read, and a data-skipping prune whose file counts are
  * recomputable in SQL. Each derives its inputs purely from the sf
  * tables so a DuckDB oracle can recompute the exact final state —
  * these are the table-maintenance capabilities a 100 TB training
  * corpus needs (recrawl upserts, takedown deletes, scan pruning), and
  * until now a regression in them was invisible to the driver's
  * per-round correctness gate.
  *
  * Scratch space: each invocation replays into fresh
  * `Files.createTempDirectory` roots (the same convention the streaming
  * specs use) — the returned DataFrame lazily reads the final snapshot,
  * so the directories must outlive the call and are left to the OS temp
  * reaper rather than deleted under the reader.
  */
object Storage {

  /** End-to-end CDC MERGE replay (streaming.CdcSink) with a DuckDB
    * oracle: seed the table from `customer`, derive a deterministic
    * change stream from `orders` (`_seq` = o_orderkey — unique and
    * total-ordered; '1-URGENT'+'F' orders become deletes; every 5th
    * order key is remapped +2000 so the insert path is exercised on
    * keys no customer holds), replay it through the real
    * foreachBatch→collapse→snapshot→commit sink in three micro-batches,
    * and return the final committed snapshot.
    *
    * Oracle-exactness across batching: the three batches are sliced
    * from the change set in `_seq` order, so sequential per-batch
    * last-wins application equals GLOBAL last-wins per key — which is
    * one SQL window (row_number over _seq desc) in DuckDB, independent
    * of how the stream was batched. A sink that loses a batch, applies
    * one twice, or collapses in arrival order instead of `_seq` order
    * breaks the hash compare.
    *
    * The driver-side collect feeding MemoryStream is the test-harness
    * seam only (the spec convention): production attaches the same sink
    * to a Kafka/file source and nothing touches the driver. */
  def cdcState(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = Files.createTempDirectory("graft-cdc-state-").toString
    val ckpt = Files.createTempDirectory("graft-cdc-state-ckpt-").toString

    graft.streaming.CdcSink.init(
      Tables.customer(s, dir).select(
        $"c_custkey".as("custkey"),
        lit("init").as("status"),
        $"c_acctbal".as("last_price")),
      root)

    val changes = Tables.orders(s, dir)
      .select(
        when($"o_orderkey" % 5 === 0, $"o_custkey" + 2000L)
          .otherwise($"o_custkey").as("custkey"),
        $"o_orderstatus".as("status"),
        $"o_totalprice".as("last_price"),
        when($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F",
          "D").otherwise("U").as("_op"),
        $"o_orderkey".as("_seq"))
      .orderBy($"_seq")
      .as[(Long, String, Double, String, Long)]
      .collect()

    val mem = MemoryStream[(Long, String, Double, String, Long)]
    val q = graft.streaming.CdcSink.apply(
      mem.toDF().toDF("custkey", "status", "last_price", "_op", "_seq"),
      root, Seq("custkey"), checkpointLocation = Some(ckpt))
    try {
      // tertile slices in _seq order: batch k's every _seq < batch
      // k+1's, the precondition for batch-order-invariant last-wins
      val third = (changes.length + 2) / 3
      changes.grouped(math.max(third, 1)).foreach { batch =>
        mem.addData(batch.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    graft.streaming.CdcSink.read(s, root).orderBy($"custkey")
  }

  /** Copy-on-write MERGE evidence (sources.Upsert): write a base
    * snapshot derived from `customer`, merge a deterministic update set
    * derived from `orders` — the latest order per customer among order
    * keys ≡ 0 (mod 7) updates that customer's row; the latest among
    * keys ≡ 3 (mod 11) inserts a fresh +1 000 000 key — and return the
    * merged snapshot the new directory holds. The anti-join∖union MERGE
    * is one SQL set expression in DuckDB, so the post-merge table is
    * hash-compared bit-for-bit (doubles round-trip parquet exactly). */
  def mergeState(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val baseDir = Files.createTempDirectory("graft-merge-base-").toString
    val dest = Files.createTempDirectory("graft-merge-dest-").toString + "/snap"

    Tables.customer(s, dir)
      .select($"c_custkey".as("custkey"), $"c_mktsegment".as("segment"),
        $"c_acctbal".as("bal"))
      .write.mode("overwrite").parquet(baseDir)

    def latestPer(filtered: DataFrame): DataFrame =
      filtered
        .withColumn("__rn", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderkey".desc)))
        .filter($"__rn" === 1).drop("__rn")
    val o = Tables.orders(s, dir)
    val updates = latestPer(o.filter($"o_orderkey" % 7 === 0))
      .select($"o_custkey".as("custkey"), $"o_orderpriority".as("segment"),
        $"o_totalprice".as("bal"))
      .unionByName(latestPer(o.filter($"o_orderkey" % 11 === 3))
        .select(($"o_custkey" + 1000000L).as("custkey"),
          $"o_orderstatus".as("segment"), $"o_totalprice".as("bal")))

    graft.sources.Upsert.upsertSnapshot(s, baseDir, updates,
      Seq("custkey"), dest)
    s.read.parquet(dest).orderBy($"custkey")
  }

  /** Data-skipping prune evidence (sources.SkippingIndex) with a FULL
    * oracle — the file-level outcome is recomputed in SQL, not just the
    * row counts: lineitem is laid out as 8 contiguous `l_orderkey`
    * ranges (one file per range — the clustered layout ZOrder produces
    * on one dimension), the min/max index is built from the real files,
    * and an interval predicate covering ~15 % of the key domain is
    * pruned through it. Because the layout is a pure function of the
    * data (bucket = ⌊key·8/(max+1)⌋, floor'd in double on both
    * engines), DuckDB recomputes the per-bucket min/max and hence exactly
    * which files an honest index must keep — files_total, files_kept,
    * rows_matched and the matched key-sum are all bit-checkable. An
    * index that stops pruning (kept = 8) or over-prunes (wrong rows /
    * key-sum through prunedRead) fails the hash compare. */
  def skippingPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-skip-").toString
    val table = s"$tmp/table"
    val li = Tables.lineitem(s, dir).select($"l_orderkey")
    val m = li.agg(max($"l_orderkey")).head.getLong(0) + 1L
    li.withColumn("b",
        floor($"l_orderkey" * lit(8.0) / lit(m.toDouble)).cast("int"))
      .repartition($"b")
      .write.partitionBy("b").parquet(table)

    val index = graft.sources.SkippingIndex.build(s, table, Seq("l_orderkey"))
      .persist()
    val lo = math.floor(m.toDouble * 0.5).toLong
    val hi = math.floor(m.toDouble * 0.65).toLong
    val filesTotal = index.count()
    val filesKept =
      graft.sources.SkippingIndex.candidateFiles(index, "l_orderkey", lo, hi)
        .length.toLong
    val matched = graft.sources.SkippingIndex
      .prunedRead(s, table, index, "l_orderkey", lo, hi)
      .agg(count(lit(1)).as("rows_matched"),
        sum($"l_orderkey").as("key_sum"))
      .head
    index.unpersist(blocking = false)
    Seq((filesTotal, filesKept, matched.getLong(0), matched.getLong(1)))
      .toDF("files_total", "files_kept", "rows_matched", "key_sum")
  }
}
