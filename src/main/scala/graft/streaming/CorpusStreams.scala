package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextAnalysis

/** Streaming face of the corpus-ingest pipeline: documents arrive as a
  * stream and each micro-batch is deduplicated against the standing
  * corpus with the SAME incremental operator the batch path uses
  * (TextAnalysis.ngramJaccardIncrementalOn), via foreachBatch.
  *
  * foreachBatch — not a stream-static join — is the right tool here:
  * the pairing is a multi-step explode/agg/join dataflow that a
  * stream-static equi-join cannot express incrementally without
  * unbounded state, while the incremental operator's semi-join prune
  * IS the bounded state-access path (only postings for the batch's
  * shingles are touched). This is the canonical "probe a static index
  * per micro-batch" pattern.
  *
  * The standing corpus is static for the lifetime of the query;
  * production pipelines append accepted batch docs to the corpus table
  * between micro-batches (sources.Upsert) and restart or re-plan —
  * intra-batch pairs (new×new) ARE flagged by the operator, so
  * within-stream duplicates still cannot slip through one batch.
  */
object CorpusStreams {

  private def tok(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      TextAnalysis.toks(col("text")).as("t"))

  /** One micro-batch of the ingest dedup: near-dup pairs between `batch`
    * and corpus ∪ batch, over the shared df-capped shingle universe —
    * bit-identical to the batch operator on the same inputs. */
  def ingestBatchPairs(corpus: DataFrame, batch: DataFrame,
      threshold: Double = 0.08, maxDf: Int = 10000): DataFrame = {
    val all = tok(corpus).withColumn("__new", lit(false))
      .unionByName(tok(batch).withColumn("__new", lit(true)))
    TextAnalysis.ngramJaccardIncrementalOn(all, col("__new"), threshold,
      maxDf)
  }

  /** Start the streaming ingest dedup over a stream of (doc_id, text,
    * lang) documents; `sink` receives each micro-batch's flagged pairs
    * (a_id, b_id, lang, jaccard) with the batch id. */
  def ingestDedup(corpus: DataFrame, docsStream: DataFrame,
      threshold: Double = 0.08, maxDf: Int = 10000)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: Dataset[Row], id: java.lang.Long) =>
        sink(ingestBatchPairs(corpus, b.toDF(), threshold, maxDf), id)
      }
      .start()

  /** Streaming JSONL landing-directory source — the production shape of
    * corpus ingest: upstream jobs drop .jsonl(.gz) shards into a
    * directory, the stream picks each file up EXACTLY ONCE (file-source
    * checkpointing; restarts resume without reprocessing — pinned in
    * CorpusStreamsSpec), and `maxFilesPerTrigger` bounds a micro-batch so
    * a backlog drains in bounded-memory steps instead of one giant batch.
    * Schema is the explicit documents shape (same rule as Tables.jsonl:
    * no inference pass, no silent widening), INCLUDING the
    * PERMISSIVE/`_corrupt` channel — malformed shard lines land there
    * with data columns null, so the stream can split good/bad with one
    * filter instead of silently emitting all-null document rows. Feed
    * the result to ingestDedup for the full landing-dir → dedup-gate
    * pipeline (filter `_corrupt IS NULL` first, as the batch path does). */
  def jsonlStream(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(graft.sources.Tables.documentsSchema
        .add(org.apache.spark.sql.types.StructField("_corrupt",
          org.apache.spark.sql.types.StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Streaming Count-Min sketch over a (lang, w) word stream — sketches
    * are the natural streaming aggregate: constant state per group
    * regardless of stream length, and because CM's merge is an exact
    * elementwise sum, the streaming result after ANY micro-batch
    * sequence is BIT-IDENTICAL to the batch sketch over the same rows
    * (pinned in CorpusStreamsSpec) — no approximation drift from
    * incremental processing, which neither MG (truncation order) nor a
    * naive top-k could promise. Complete-mode output: the state store
    * carries the serialized sketch buffer per group. */
  def cmWordsStream(words: DataFrame, probes: Seq[String]): DataFrame =
    words.groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(graft.functions.SketchAggs
        .cmEstimate(org.apache.spark.sql.functions.col("w"), probes)
        .as("ests"))

  /** Streaming HLL distinct-count sketch over a (grp, v) stream — the
    * distinct-count face of the same streaming-sketch principle:
    * register max-merge is idempotent, commutative, and associative, so
    * the streamed state after ANY micro-batch sequence is BIT-IDENTICAL
    * to the batch sketch over the same rows — including when later
    * batches re-deliver values already counted (re-observing a value
    * max-merges a rank already present: distinct-count state cannot
    * double-count, the property that makes HLL safe under at-least-once
    * delivery). Pinned in CorpusStreamsSpec. */
  def hllStream(rows: DataFrame): DataFrame =
    rows.groupBy(org.apache.spark.sql.functions.col("grp"))
      .agg(graft.functions.SketchAggs
        .hllDistinct(org.apache.spark.sql.functions.col("v"), 8, 42L)
        .as("h"))
}
