package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.sources.Tables

/** Text-analysis operators over the documents table: tokenization, token
  * statistics, quality scoring, language-ID heuristic, fingerprinting,
  * exact dedup, n-gram Jaccard near-dup, and the link-prediction candidate
  * featurization (the reference's p1 relational core, Predictor.scala:
  * 213-312, re-expressed with set-semantics intersect so it is
  * oracle-checkable; the multiset variant lives in graft.functions.TextOps).
  *
  * All token work uses codegen'd built-ins + higher-order functions — no
  * UDFs in the hot path. Pairwise queries use blocking keys (lang/source)
  * so the self-join is bucketed, not a cross join; at cluster scale the
  * blocking key becomes the shuffle key and each block is independent.
  */
object TextAnalysis {

  /** whitespace tokenize; the corpus is single-space separated. */
  def toks(c: Column): Column = split(c, " ")

  /** Per-language token statistics (groupBy agg over arrays). */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"lang", $"n_chars", toks($"text").as("t"))
      .select($"lang", $"n_chars", size($"t").as("n_tokens"),
        size(array_distinct($"t")).as("n_distinct"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        sum($"n_distinct").as("total_distinct"),
        (sum($"n_tokens").cast("double") / count(lit(1)).cast("double"))
          .as("avg_tokens"),
        sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
  }

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document quality scoring: length, stopword ratio, distinct ratio. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars", toks($"text").as("t"))
      .select(
        $"doc_id", $"n_chars",
        size($"t").as("n_tokens"),
        size(filter($"t", c => c.isInCollection(stopwords))).as("n_stop"),
        size(array_distinct($"t")).as("n_distinct"))
      .select(
        $"doc_id", $"n_chars", $"n_tokens",
        ($"n_stop".cast("double") / $"n_tokens".cast("double")).as("stopword_ratio"),
        ($"n_distinct".cast("double") / $"n_tokens".cast("double")).as("distinct_ratio"),
        ($"n_chars".cast("double") / $"n_tokens".cast("double")).as("avg_token_len"))
      .orderBy($"doc_id")
  }

  /** Deflate length of a byte string at a FIXED level with raw (nowrap)
    * framing — the kernel behind compressRatio. Deterministic for a
    * given JDK zlib: same input, same level, same strategy → same
    * bitstream (the spec recomputes it in-process to pin this). */
  def deflateLen(b: Array[Byte], level: Int = 6): Long = {
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(b)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  /** Cross-JVM deflate-drift tripwire (ADVICE r10): q_compress_ratio is
    * rows-only, so a heterogeneous executor JDK (or one linked against
    * zlib-ng / system zlib) producing a DIFFERENT level-6 bitstream would
    * silently change n_deflate and keep verdicts with nothing to catch
    * it. Each executor JVM checks ONCE (lazy val) that its deflate of a
    * fixed probe matches the length pinned at build time on the
    * reference JDK; drift fails the task loudly instead of shipping
    * silently-shifted quality verdicts. Zero per-row cost after the
    * first row on each executor. */
  private val DeflateProbeText =
    "graft deflate determinism probe 0123456789 abcdefghijklmnopqrstuvwxyz " * 4
  private val DeflateProbeLen = 73L // pinned: OpenJDK 17 zlib, level 6, nowrap
  @transient private lazy val deflateProbeOk: Boolean = {
    val got = deflateLen(DeflateProbeText.getBytes("UTF-8"))
    require(got == DeflateProbeLen,
      s"deflate probe drift: this JVM compresses the fixed probe to $got " +
        s"bytes, expected $DeflateProbeLen — its zlib differs from the " +
        "build JDK's, so compressRatio verdicts would not be reproducible")
    true
  }

  /** Compression-ratio quality signal (q_compress_ratio): the
    * Gopher-family repetitiveness filter that needs no tokenizer —
    * deflate(text)/|text|. Highly compressible text (boilerplate,
    * templated spam, keyword stuffing) lands low; incompressible text
    * (minified code, base64 residue, wrong-encoding bytes) lands ~1.
    * Both tails are drop candidates; the keep band is [0.25, 0.95].
    * ratio_x1000 is an INTEGER (floor of a long product quotient) so
    * the per-doc row is float-free. Rows-only by design: the deflate
    * bitstream has no DuckDB twin — the spec pins the kernel by
    * in-process recompute instead, the JPEG-stats convention. Per-doc
    * map over the corpus: embarrassingly parallel, no shuffle until
    * the final diagnostic sort. */
  def compressRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)]
      .map { case (id, source, text) =>
        require(deflateProbeOk) // per-executor-JVM zlib drift tripwire
        val raw = text.getBytes("UTF-8")
        val defl = deflateLen(raw)
        val ratioX1000 =
          if (raw.length == 0) 1000L else defl * 1000L / raw.length
        (id, source, raw.length.toLong, defl, ratioX1000,
          ratioX1000 >= 250L && ratioX1000 <= 950L)
      }
      .toDF("doc_id", "source", "n_bytes", "n_deflate", "ratio_x1000",
        "keep")
      .orderBy($"doc_id")
  }

  /** Lexical-commonness scoring: each document's mean document-frequency
    * over its distinct tokens — the integer-exact stand-in for unigram-LM
    * perplexity (low mean df = rare/OOV-heavy text: noise, code, wrong
    * language; high = stopword soup; both tails are filter candidates).
    * A true log-prob score would sum libm logs, whose value depends on
    * summation order — unusable for a bit-matching oracle; sum-of-integer
    * df with ONE final IEEE division is exactly rounded everywhere.
    *
    * Shape: distinct-token explode → df agg (map-side combinable, one row
    * per vocabulary word) → join back (AQE broadcasts the df side when
    * the vocabulary is small; at web scale both sides shuffle on `tok`,
    * the high-cardinality key) → per-doc rollup. */
  def dfScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"doc_id", explode(array_distinct(toks($"text"))).as("tok"))
    val dfs = d.groupBy($"tok").agg(count(lit(1)).as("df"))
    d.join(dfs, "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_distinct"),
        sum($"df").as("df_sum"),
        (sum($"df").cast("double") / count(lit(1)).cast("double"))
          .as("mean_df"))
      .orderBy($"doc_id")
  }

  /** DSIR-style importance weighting (q_dsir_weights): data selection
    * for a target domain via n-gram importance resampling — Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling" (NeurIPS), the standard recipe for up-sampling
    * domain-relevant mass out of a raw crawl. Each token's weight is the
    * Laplace-smoothed ratio of its occurrence mass in the TARGET domain
    * (here: one source) vs the RAW pool (all other sources); a
    * document's score is the mean weight over its token stream, and
    * `keep` marks above-baseline target affinity — the resampling
    * acceptance set. (DSIR proper samples with probability ∝ the
    * importance weight; the deterministic threshold keeps the oracle
    * exact while exercising the same weight computation.)
    *
    * Bit-exactness: weights are single IEEE divisions of exact integer
    * counts (+1 smoothing); the per-doc sum folds weights in sorted
    * token order on BOTH engines (the bm25TopK device), then one final
    * division by n_tokens. The 55/1024 threshold is dyadic, so the keep
    * comparison cannot straddle a rounding ulp. Baseline intuition: with
    * S uniform sources a background token's weight ≈ 1/(S−1) ≈ 0.0526;
    * this corpus has no source-exclusive vocabulary, so scores spread in
    * a narrow band around that baseline driven by rare-token smoothing
    * (measured min/max: 0.0508–0.0678 at sf0.001, 0.0527–0.0603 at
    * sf0.01, 0.0496–0.0559 at sf0.1). 55/1024 ≈ 0.0537 is the dyadic
    * point inside ALL three bands, so both verdicts are non-vacuous at
    * every SF (pinned at sf0.01 in TextAnalysisSpec); on a real mixed
    * corpus the target's distinctive vocabulary widens the band and the
    * threshold becomes a genuine domain-affinity cut.
    *
    * Scale shape: one vocab-keyed map-side-combinable aggregate (the
    * weight table), one join back (AQE broadcasts the vocab side when
    * small; at web scale both sides shuffle on the high-cardinality
    * `tok`), one per-doc fold over the doc's own tokens — all linear,
    * the dfScore/bm25 shape. No pairwise anything. */
  def dsirWeights(s: SparkSession, dir: String, target: String = "src0",
      threshold: Double = 55.0 / 1024.0): DataFrame = {
    import s.implicits._
    val t = Tables.documents(s, dir)
      .select($"doc_id", $"source", explode(toks($"text")).as("tok"))
    val w = t.groupBy($"tok").agg(
      ((sum(when($"source" === target, 1L).otherwise(0L)) + 1L)
        .cast("double") /
        (sum(when($"source" =!= target, 1L).otherwise(0L)) + 1L)
          .cast("double")).as("wt"))
    t.join(w, "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(
          transform(sort_array(collect_list(struct($"tok", $"wt"))),
            x => x.getField("wt")),
          lit(0.0), (acc, x) => acc + x).as("wsum"))
      .select($"doc_id", $"n_tokens",
        ($"wsum" / $"n_tokens".cast("double")).as("dsir_score"),
        ($"wsum" / $"n_tokens".cast("double") >= threshold).as("keep"))
      .orderBy($"doc_id")
  }

  /** CCNet-style LM fluency scoring (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * perplexity under a reference LM is the canonical fluency filter for
    * crawled training text. The LM here is a Laplace-smoothed bigram
    * model trained on the corpus itself (CCNet trains on a clean target
    * corpus; with no external data in this environment the corpus is the
    * reference distribution, and low-probability docs are the fluency
    * outliers — disfluent token order relative to corpus norms).
    *
    * Float parity (oracle-checked): the score is the per-doc MEAN of
    * the smoothed conditional probabilities
    * p(w₂|w₁) = (c(w₁w₂) + 1) / (c_hist(w₁) + V), where c_hist counts
    * w₁ as a bigram history (Σ_w₂ c(w₁w₂) = c_hist(w₁), the
    * self-consistent MLE denominator) and V is the corpus vocabulary —
    * rational arithmetic only (no libm log, which differs in the last
    * ulp across runtimes: the tfidf rational-IDF argument), folded in
    * sorted-bigram order (the dsirWeights device) so both engines run
    * the identical IEEE addition sequence. Mean-probability ranks
    * fluency the way mean log-prob does for a fixed doc-length mix.
    * The dyadic 34/1024 keep threshold sits inside the measured score
    * band at every SF (min/median/max: 0.0301/0.0344/0.0396 at
    * sf0.001, 0.0304/0.0345/0.0388 at sf0.01, 0.0294/0.0334/0.0421 at
    * sf0.1), so both verdicts are non-vacuous everywhere.
    *
    * Scale shape: one bigram-keyed map-side-combinable count (c_hist is
    * a second partial agg over its w₁ prefix), one global distinct-count
    * for V, a join back on the high-cardinality bigram key, one per-doc
    * fold over the doc's own bigrams — all linear, the dfScore/dsir
    * shape. No pairwise anything. */
  def lmFluency(s: SparkSession, dir: String,
      threshold: Double = 34.0 / 1024.0): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", toks($"text").as("t"))
      .filter(size($"t") >= 2)
    val inst = docs
      .select($"doc_id", explode(bigramShingles($"t")).as("bg"))
      .withColumn("w1", split($"bg", " ").getItem(0))
    val bgCounts = inst.groupBy($"bg").agg(count(lit(1)).as("c_bg"))
    val histCounts = inst.groupBy($"w1").agg(count(lit(1)).as("c_hist"))
    // V = |vocabulary| over ALL token positions (standard Laplace mass)
    val v = Tables.documents(s, dir)
      .select(explode(toks($"text")).as("tok"))
      .agg(countDistinct($"tok")).head().getLong(0)
    inst
      .join(bgCounts, "bg")
      .join(histCounts, "w1")
      .withColumn("p", ($"c_bg" + 1L).cast("double") /
        ($"c_hist" + lit(v)).cast("double"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(sort_array(collect_list(struct($"bg", $"p"))),
            x => x.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("psum"))
      .select($"doc_id", $"n_bigrams",
        ($"psum" / $"n_bigrams".cast("double")).as("lm_score"),
        ($"psum" / $"n_bigrams".cast("double") >= threshold).as("keep"))
      .orderBy($"doc_id")
  }

  /** Gopher/C4-style repetition quality filter — the complement of
    * qualityScore's surface stats: repetition is THE dominant failure
    * mode of crawled training text (boilerplate, templated pages, spam),
    * and the canonical signals are duplicate-token mass and the mass of
    * the single most-frequent n-gram (Rae et al. 2021 "Scaling Language
    * Models", table A1 — their "duplicate n-gram fraction" family).
    *
    * Dataflow is the scalable explode shape, not per-row HOF loops: one
    * slim (doc_id, bigram) explode → map-side-combinable count → per-doc
    * max. Two shuffles, both keyed by doc_id prefix, each partial-agged.
    * Thresholds: a dyadic 1/16 for the modal-bigram mass (so the double
    * comparison is exact in every engine) and 0.65 duplicate-token mass —
    * both sit between the corpus p50 and p99, so the verdict is
    * non-vacuous either way. Fractions are single IEEE divisions of
    * exact integers — bit-identical cross-engine. */
  def repetitionFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables.documents(s, dir)
      .select($"doc_id", toks($"text").as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", $"t", size($"t").as("n_tokens"),
        size(array_distinct($"t")).as("n_distinct"))
    val modal = t
      .select($"doc_id", explode(TextOps.shingles($"t", 2)).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_bigram_n"))
    t.drop("t").join(modal, "doc_id")
      .select($"doc_id", $"n_tokens", $"top_bigram_n",
        (lit(1.0) - $"n_distinct".cast("double") / $"n_tokens".cast("double"))
          .as("dup_token_frac"),
        ($"top_bigram_n".cast("double") /
          ($"n_tokens" - 1).cast("double")).as("top_bigram_frac"))
      .withColumn("keep",
        $"dup_token_frac" <= 0.65 && $"top_bigram_frac" <= 0.0625)
      .orderBy($"doc_id")
  }

  /** Deterministic sequence packing — assign documents to fixed-budget
    * token bins, the step that turns a filtered corpus into training
    * sequences. Documents are packed contiguously in (lang, source,
    * doc_id) order; a document starting before a bin boundary stays in
    * its start bin (the standard streaming approximation of first-fit —
    * exact capacity packing is inherently sequential and not worth a
    * shuffle-breaking loop). bin = (cumsum − n_tokens) div budget over
    * a per-(lang, source) window: the window key is the INGEST SHARD,
    * so at 100 TB each partition is one shard's worth — the sort is
    * within-shard, never global. All arithmetic is integer, so the
    * assignment is bit-reproducible in any engine.
    *
    * Output is the per-bin manifest (doc span + token mass), i.e. what a
    * sequence-builder job would consume. */
  def tokenPacking(s: SparkSession, dir: String,
      budget: Int = 2048): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source",
        size(toks($"text")).as("n_tokens"))
      .withColumn("csum", sum($"n_tokens").over(w))
      .withColumn("bin", expr(s"(csum - n_tokens) div $budget"))
      .groupBy($"lang", $"source", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("bin_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"source", $"bin")
  }

  /** Context-window chunking with stride — long documents split into
    * overlapping fixed-size token windows (the standard prep for both
    * training sequences and retrieval indexing). Chunk k covers 1-based
    * tokens [k·stride + 1, k·stride + window], the final chunk may be
    * short, and chunk count is 1 + ceil(max(n − window, 0) / stride) —
    * every token is covered and consecutive chunks overlap by
    * window − stride tokens. One generator explode per document; no
    * shuffle at all until the presentation sort (at scale: none).
    *
    * Chunks are emitted as md5 fingerprints + spans, not text: the
    * driver-side result stays slim, and the fingerprint makes the
    * chunking bit-checkable cross-engine without hashing arrays. */
  def docChunks(s: SparkSession, dir: String, window: Int = 32,
      stride: Int = 24): DataFrame = {
    import s.implicits._
    chunkFrame(s, dir, window, stride).orderBy($"doc_id", $"chunk_id")
  }

  /** The unordered chunk frame behind docChunks/chunkDedup — one row per
    * (doc, chunk) with position, length, and content fingerprint. */
  private def chunkFrame(s: SparkSession, dir: String, window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", toks($"text").as("t"))
      .withColumn("n_tokens", size($"t"))
      .withColumn("n_chunks", expr(
        s"1L + (greatest(n_tokens - $window, 0) + ${stride - 1}) div $stride"))
      .select($"doc_id", $"t", $"n_tokens",
        explode(sequence(lit(0L), $"n_chunks" - 1L)).as("chunk_id"))
      .select($"doc_id", $"chunk_id",
        ($"chunk_id" * stride + 1L).as("start_tok"),
        least(lit(window.toLong),
          $"n_tokens" - $"chunk_id" * stride).as("chunk_len"),
        md5(concat_ws(" ", slice($"t",
          ($"chunk_id" * stride + 1L).cast("int"),
          least(lit(window.toLong), $"n_tokens" - $"chunk_id" * stride)
            .cast("int")))).as("chunk_md5"))
  }

  /** Chunk-level exact dedup — the paragraph/substring-dedup analogue
    * (RefinedWeb/Falcon dedup at sub-document granularity): a chunk
    * survives only at its FIRST corpus occurrence (global (doc_id,
    * chunk_id) order — deterministic), and each document reports how
    * much of it survived. Two shuffles, both content-bounded: the
    * first-occurrence window keys on the content fingerprint (the 100 TB
    * shuffle key — never the text; the md5 is 16 bytes however long the
    * chunk), the per-doc rollup keys on doc_id. */
  def chunkDedup(s: SparkSession, dir: String, window: Int = 32,
      stride: Int = 24): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"chunk_md5").orderBy($"doc_id", $"chunk_id")
    chunkFrame(s, dir, window, stride)
      .select($"doc_id", $"chunk_id", $"chunk_md5")
      .withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"))
      .select($"doc_id", $"n_chunks", $"n_kept",
        ($"n_chunks" - $"n_kept").as("n_dropped"))
      .orderBy($"doc_id")
  }

  /** Content-defined chunking — chunk boundaries chosen by a rolling
    * content hash of the tokens themselves (the CDC idea behind rsync/
    * LBFS and substring-dedup pipelines), NOT by fixed offsets: a token
    * whose salted md5 falls below `boundaryHex` ends its chunk. Insert or
    * delete a token and only the chunk containing the edit (plus at most
    * its successor boundary) changes its fingerprint — fixed-window
    * chunking (docChunks) shifts EVERY downstream chunk, defeating
    * chunk-level dedup across near-identical documents. The expected
    * chunk length is 256/parseInt(boundaryHex,16) tokens (default "10" →
    * 16 tokens); CdcSpec pins the edit-locality property.
    *
    * Dataflow: posexplode → per-doc running boundary count (window keyed
    * doc_id — the per-doc sort is within one partition's rows, the same
    * shape as userSessions) → groupBy (doc, chunk) re-assembling each
    * chunk's text for its fingerprint. Chunks travel as md5 + span, not
    * text, so the shuffled rows stay slim at any scale. All decisions are
    * pure string/md5 arithmetic — bit-reproducible cross-engine.
    *
    * Bound caveat: chunk length is probabilistic (geometric, mean
    * 256/boundary), not hard-capped — a document whose tokens all hash
    * above the boundary forms ONE chunk, and its reassembly group is the
    * whole document (the aggregate is sort-based and spills, so this
    * degrades, not breaks). FastCDC-style hard min/max cuts are
    * inherently sequential from the last cut and would cost the
    * edit-locality property if approximated with aligned positions; run
    * exact dedup first and this tail is the already-degenerate mass. */
  def cdcChunks(s: SparkSession, dir: String,
      boundaryHex: String = "10"): DataFrame = {
    import s.implicits._
    cdcFrame(s, dir, boundaryHex).orderBy($"doc_id", $"chunk_id")
  }

  /** The unordered CDC chunk frame behind cdcChunks/cdcDedup. */
  private def cdcFrame(s: SparkSession, dir: String,
      boundaryHex: String): DataFrame = {
    import s.implicits._
    require(boundaryHex.length == 2 &&
      boundaryHex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"boundaryHex must be two lowercase hex digits: $boundaryHex")
    // boundary token ENDS its chunk → chunk id = boundaries seen STRICTLY
    // before this token (rowsBetween excludes the current row)
    val wPrev = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"doc_id", posexplode(toks($"text")).as(Seq("pos", "tok")))
      .withColumn("b",
        when(substring(md5(concat(lit("cdc:"), $"tok")), 1, 2) < boundaryHex, 1L)
          .otherwise(0L))
      .withColumn("chunk_id", coalesce(sum($"b").over(wPrev), lit(0L)))
      .groupBy($"doc_id", $"chunk_id")
      .agg(count(lit(1)).as("n_tokens"),
        min($"pos").as("start_pos"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct($"pos", $"tok"))),
            x => x.getField("tok")))).as("chunk_md5"))
  }

  /** CDC-chunk dedup — chunkDedup's first-occurrence survival accounting
    * over content-defined chunks instead of fixed windows. Because CDC
    * boundaries are content-anchored, a near-duplicate document's chunks
    * hash-match the original's even when edits shift token offsets, so
    * the per-doc survival fraction here is the honest cross-document
    * redundancy measure (fixed windows only catch aligned duplicates).
    * Same two content-bounded shuffles: fingerprint window, doc rollup. */
  def cdcDedup(s: SparkSession, dir: String,
      boundaryHex: String = "10"): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"chunk_md5").orderBy($"doc_id", $"chunk_id")
    cdcFrame(s, dir, boundaryHex)
      .select($"doc_id", $"chunk_id", $"n_tokens", $"chunk_md5")
      .withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when($"rn" === 1, $"n_tokens").otherwise(0L)).as("kept_tokens"),
        sum($"n_tokens").as("total_tokens"))
      .select($"doc_id", $"n_chunks", $"n_kept",
        ($"n_chunks" - $"n_kept").as("n_dropped"),
        $"kept_tokens", $"total_tokens")
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination — flag training documents that share long
    * n-grams with an evaluation set (the canonical pre-training hygiene
    * step; 8-gram overlap is the published convention, e.g. GPT-3
    * appendix C). The "benchmark" here is a deterministic stand-in
    * (doc_id ≡ 0 mod 100): real pipelines substitute their eval-set
    * table, and the dataflow is unchanged.
    *
    * Shape: benchmark n-grams are DISTINCT and broadcast (eval sets are
    * KB–MB next to a corpus — the one broadcast in this file that is
    * small BY CONSTRUCTION); training docs explode their distinct
    * n-grams once, left-join the broadcast set with a hit marker, and a
    * single per-doc aggregate yields both the gram count and the
    * contaminated count — clean docs report 0. Contamination cost is one
    * linear pass over corpus shingles at any scale.
    *
    * The default n = 8 is the published convention for natural text;
    * q_contamination registers at n = 3 because the synthetic corpus
    * draws from a ~50-word vocabulary (8-gram collisions require
    * near-verbatim copies, which the generator only plants between
    * non-benchmark docs — measured all-zero at n ≥ 5), and a vacuous
    * always-false flag tests nothing. */
  def contamination(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    import s.implicits._
    val toksD = Tables.documents(s, dir)
      .select($"doc_id", toks($"text").as("t"))
      .filter(size($"t") >= n)
    val isBench = $"doc_id" % 100 === 0
    val benchGrams = toksD.filter(isBench)
      .select(explode(array_distinct(TextOps.shingles($"t", n))).as("g"))
      .distinct()
    // One linear pass over corpus shingles: explode each training doc's
    // distinct n-grams once, mark benchmark membership via the broadcast
    // left join, and aggregate per doc (count = n_grams, sum of hit
    // markers = n_contaminated). Every training doc has >= 1 shingle
    // (size(t) >= n above), so no doc is lost to the explode.
    toksD.filter(!isBench)
      .select($"doc_id",
        explode(array_distinct(TextOps.shingles($"t", n))).as("g"))
      .join(broadcast(benchGrams.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        coalesce(sum($"hit"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_rate",
        $"n_contaminated".cast("double") / $"n_grams".cast("double"))
      .withColumn("flagged", $"contamination_rate" >= 0.0625)
      .orderBy($"doc_id")
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"),
    "zh" -> Seq("ni", "hao", "ma"))

  /** Marker-token-voting language-ID heuristic (deterministic argmax with
    * fixed tie-break order). A real n-gram profile model lives in
    * graft.functions.TextOps; this variant is SQL-expressible. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scoreCols = langMarkers.map { case (lang, ms) =>
      size(filter($"t", c => c.isInCollection(ms))).as(s"s_$lang")
    }
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"lang", toks($"text").as("t"))
      .select(($"doc_id" +: $"lang" +: scoreCols): _*)
    val langs = langMarkers.map(_._1)
    // argmax with ties resolved by marker declaration order
    val guess = langs.init.foldRight(lit(langs.last)) { (lang, elseCol) =>
      val ge = langs.filter(_ != lang)
        .map(o => col(s"s_$lang") >= col(s"s_$o"))
        .reduce(_ && _)
      when(ge, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("lang_guess", guess)
      .select($"doc_id", $"lang", $"lang_guess")
      .orderBy($"doc_id")
  }

  /** Content fingerprint (md5) + duplicate-group size per fingerprint. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wFp = Window.partitionBy($"fp")
    Tables.documents(s, dir)
      .select($"doc_id", md5($"text").as("fp"))
      .withColumn("n_same", count(lit(1)).over(wFp))
      .orderBy($"doc_id")
  }

  /** Exact deduplication: keep the lowest doc_id per (lang, source) group
    * (hash-groupBy dedup; generalizes to any key set, incl. full content). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
    Tables.documents(s, dir)
      .select($"lang", $"source", $"doc_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lang", $"source", $"doc_id".as("kept_doc_id"))
      .orderBy($"lang", $"source")
  }

  /** Word-bigram shingles of a token array.
    *
    * Formulated as zip_with(t, t[2..], concat) + array_compact rather than
    * transform(sequence(1, n-1), i -> concat(t[i], t[i+1])): zip_with
    * evaluates its two array arguments ONCE per row, while element_at(t, i)
    * re-evaluates `t` per element — if Catalyst inlines `t = split(text)`
    * into the lambda (CollapseProject does, even across a repartition),
    * the indexed form re-runs the regex split O(tokens) times per row,
    * which measured ~100× slower on the documents corpus. The trailing
    * (t[n], null) pair concats to null and is dropped by array_compact. */
  def bigramShingles(t: Column): Column =
    array_compact(zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (x, y) => concat(x, lit(" "), y)))

  /** N-gram (word-bigram) Jaccard near-duplicate pairs, blocked by lang.
    * Set semantics (array_distinct/array_intersect-equivalent) —
    * oracle-parity with DuckDB list_distinct/list_intersect.
    *
    * Inverted-index formulation: explode shingles → equi-join postings on
    * (lang, shingle) → per-pair count = |intersection|. Equivalent to the
    * quadratic blocked self-join for any threshold > 0 (zero-overlap pairs
    * have jaccard 0 and can never pass), but the shuffle key is the
    * high-cardinality (lang, shingle) instead of the 5-value lang — the
    * blocked form ran each language's whole O(n²) block in ONE task and
    * rebuilt a hash set per pair. This form scales with #postings and
    * parallelizes freely; hot shingles (stopword bigrams) are the skew
    * risk at 100 TB — cap them with a document-frequency filter upstream
    * or fall back to graft.operators.Dedup.minhashNearDup. */
  def ngramJaccardPairs(s: SparkSession, dir: String,
      threshold: Double = 0.12): DataFrame = {
    import s.implicits._
    val pairs =
      if (threshold >= BaseNearDupThreshold)
        // Any threshold ≥ the base is a pure filter over the shared
        // materialized pair frame — exact because the cached `jaccard`
        // doubles are the very values the direct plan would compare.
        scoredNearDupPairs(s, dir).filter($"jaccard" >= threshold)
      else
        ngramJaccardPairsOn(shingleTokens(s, dir), threshold,
          maxDf = NearDupMaxDf)
    pairs.orderBy($"a_id", $"b_id")
  }

  /** Base threshold of the shared scored-pair frame: the loosest any
    * consumer (GraphQueries.pairGraph) asks for. */
  val BaseNearDupThreshold = 0.08

  /** The per-(lang, shingle) document-frequency cap of the near-dup pair
    * universe. ONE constant by design (ADVICE r11): the pair frame
    * (scoredNearDupPairs), the twin quotient (twinClasses.`survived`) and
    * the DuckDB oracle CTE (SparkEntry.cappedShingleCte) must all cap at
    * the SAME df or pairTriangles' quotient expansion silently diverges
    * from the pair frame it decomposes. */
  val NearDupMaxDf = 10000

  private val nearDupCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Session-scoped materialized intermediate: n-gram Jaccard pairs at the
    * base threshold, persisted on first use. Five queries consume this
    * frame (q_ngram_jaccard and the four pair-graph analytics), and the
    * posting join that produces it dominates their cost — recomputing it
    * per query is the classic shared-scan/materialized-view miss. The
    * frame itself is tiny (one row per near-dup pair), so MEMORY_AND_DISK
    * holds it comfortably at any scale where the pair join itself is
    * feasible; on a cluster this is the same pattern as CACHE TABLE on a
    * shared CTE. Keyed by (session, dir) so tests at other SFs coexist. */
  def scoredNearDupPairs(s: SparkSession, dir: String): DataFrame =
    nearDupCache.getOrElseUpdate((s, dir),
      graft.Caches.pin(
        ngramJaccardPairsOn(shingleTokens(s, dir), BaseNearDupThreshold,
          maxDf = NearDupMaxDf)))

  /** Drop this session's materialized pair frames — call when a `dir` is
    * rewritten in place (the cache would serve stale pairs) or at session
    * teardown in a long-lived multi-session JVM (entries otherwise pin
    * the session object and its cached blocks; the harness mains are
    * one-session-per-JVM, so they never need this). Sibling:
    * GraphQueries.invalidateCache. */
  def invalidateCache(s: SparkSession): Unit = {
    nearDupCache.keys.filter(_._1 eq s).foreach { k =>
      nearDupCache.remove(k).foreach(_.unpersist(blocking = false))
    }
    winnowCache.keys.filter(_._1 eq s).foreach { k =>
      winnowCache.remove(k).foreach(_.unpersist(blocking = false))
    }
    twinClassCache.keys.filter(_._1 eq s).foreach { k =>
      twinClassCache.remove(k).foreach(_.unpersist(blocking = false))
    }
    twinMemberCache.keys.filter(_._1 eq s).foreach { k =>
      twinMemberCache.remove(k).foreach(_.unpersist(blocking = false))
    }
  }

  /** Token arrays for the shingle path, materialized BEHIND an exchange.
    * Without the barrier, CollapseProject inlines `t = split(text)` into
    * the shingle lambda, and `element_at(split(text), i)` re-runs the
    * full regex split for every element — O(tokens²) interpreted work
    * per document, in the scan's single task. The repartition also
    * spreads the (single-split) scan so shingling and the posting-join
    * probe (Σ df² ≈ 19M rows at sf0.1) parallelize.
    *
    * maxDf 10000 at the call sites is a measured no-op on the test
    * corpus (max observed shingle df: 28 at sf0.01, 152 at sf0.1); since
    * r11 the DuckDB oracles mirror the cap structurally
    * (SparkEntry.cappedShingleCte), so the bit-match holds by
    * construction even on a corpus where the cap binds. At production
    * scale the cap is the load-bearing skew guard (see
    * ngramJaccardPairsOn). */
  private def shingleTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", toks($"text").as("t"))
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** Core of ngramJaccardPairs over a (doc_id, lang, t: array&lt;string&gt;)
    * frame, with a hot-shingle document-frequency cap.
    *
    * Shingles occurring in more than `maxDf` documents (within a lang) are
    * excluded from the pairing universe — both from the intersection
    * (postings) and the union (per-doc sizes), so Jaccard stays coherent
    * over the capped universe. This is the guard against the reference's
    * p2 cliff (Predictor.scala:26-28): at 100 TB a stopword bigram like
    * "of the" has df ≈ corpus size, and its posting self-join alone is
    * df² pairs — quadratic in corpus size, unrunnable. A df-capped shingle
    * contributes ≤ maxDf² pairs, bounding the join output by
    * #shingles × maxDf². The hot set is tiny by construction (few shingles
    * exceed the cap), so it is broadcast and postings are pruned with a
    * broadcast anti-join — no extra shuffle of the posting list. */
  /** Shared posting-join core: per blocked pair (a_id < b_id, same
    * lang), the distinct-shingle intersection count plus both documents'
    * distinct-shingle sizes — everything any set-overlap measure
    * (Jaccard, containment, overlap coefficient) needs. Shingles are
    * hashed to xxhash64 longs at explode time: the posting join key
    * becomes (lang, 8-byte long) instead of (lang, string) — narrower
    * shuffle rows and long-equality probes across the Σdf² posting
    * self-join (~19M probe rows at sf0.1). Counts are unchanged unless
    * two distinct shingles of the same language collide in 64 bits
    * (P ≈ 10⁻¹³ over this corpus) — same determinism argument as the
    * minhash signature path; the string-level oracles still bit-match. */
  /** Duplication factor above which postingPairCounts switches to the
    * twin-collapsed form — the family-wide constant lives with the
    * family-wide probe (operators.DupProbe, r12). */
  private def CollapseDupFactor = graft.operators.DupProbe.CollapseDupFactor

  /** (doc_id, lang, distinct hashed shingle set) — the input both
    * pairwise forms share. */
  private[queries] def shingleFrame(tokens: DataFrame): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    tokens.select($"doc_id", $"lang",
      array_distinct(transform(bigramShingles($"t"), sh => xxhash64(sh)))
        .as("sh"))
  }

  private def postingPairCounts(tokens: DataFrame, maxDf: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    val d = shingleFrame(tokens)
    // EXACT-TWIN COLLAPSE VALVE — the guard that makes the pairwise core
    // survive duplicated corpora (a web crawl IS mostly exact dups; the
    // r10 30× twin-replica run timed the direct form out at >360 s,
    // because every shingle's df multiplies by the dup factor and the
    // posting self-join probe mass by its square — measured ~7 s
    // collapsed). Engagement is adaptive, the hot-bucket-guard style:
    // one cheap linear probe estimates the exact-duplication factor as
    // docs per distinct TOKEN-SEQUENCE hash — no shingle/sort work, so
    // the probe costs a narrow scan, not a second shingle pass. (Docs
    // that differ in token order but share a shingle SET escape the
    // probe; they are negligible duplication mass, and the branch choice
    // only affects COST — both branches produce IDENTICAL rows, so the
    // oracle hash never depends on it.) A dup-light corpus (the common
    // case — and where the collapse's extra wide shuffle costs 3-5×)
    // keeps the direct form. Memoized (DupProbe, r12): the near-dup
    // family shares one probe pass per session instead of one per query.
    val dupFactor =
      graft.operators.DupProbe.dupFactor(tokens, $"lang", $"t")
    if (dupFactor < CollapseDupFactor) postingPairCountsDirect(d, maxDf)
    else postingPairCountsCollapsed(d, maxDf)
  }

  /** The direct posting-join form — optimal when exact twins are rare. */
  private[queries] def postingPairCountsDirect(d: DataFrame,
      maxDf: Int): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val posts = d.select($"lang", $"doc_id", explode($"sh").as("shingle"))
    // df agg is map-side combinable; output cardinality = distinct
    // (lang, shingle) — small. Only the > maxDf tail is broadcast.
    val hot = posts.groupBy($"lang", $"shingle")
      .agg(count(lit(1)).as("df"))
      .filter($"df" > maxDf)
      .select($"lang", $"shingle")
    val kept = posts.join(broadcast(hot), Seq("lang", "shingle"), "left_anti")
    val sizes = kept.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    kept
      .select($"lang", $"doc_id".as("a_id"), $"shingle")
      .join(kept.select($"lang".as("b_lang"), $"doc_id".as("b_id"), $"shingle".as("b_shingle")),
        $"lang" === $"b_lang" && $"shingle" === $"b_shingle" && $"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id", $"lang")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"doc_id".as("a_id"), $"n".as("a_n")), "a_id")
      .join(sizes.select($"doc_id".as("b_id"), $"n".as("b_n")), "b_id")
      .select($"a_id", $"b_id", $"lang", $"inter", $"a_n", $"b_n")
  }

  /** The twin-collapsed form: documents with the IDENTICAL shingle set
    * form one equivalence class; the posting join runs on one
    * representative per class (probe mass = unique-content corpus, dup
    * factor gone) and classes expand back into member pairs afterwards
    * — pure output-sized work. The expansion reproduces the direct
    * form's rows EXACTLY: inter/a_n/b_n are class-level constants, and
    * intra-class (twin) pairs have inter = a_n = b_n. */
  private[queries] def postingPairCountsCollapsed(d: DataFrame,
      maxDf: Int): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    // class key = the sorted shingle set itself (exact — no collision
    // caveat); the shuffle carries each doc's set once either way.
    // Class assignment via a WINDOW over the set key rather than a
    // groupBy + collect_list(doc_id): the old form materialized each
    // class's full member list into ONE row and expanded pairs with a
    // double explode, so a mega-class (a boilerplate page replicated
    // corpus-wide) concentrated an O(n²) expansion and an O(n) array in
    // a single task/row (ADVICE r10). The window streams each class's
    // rows through its partition group (spilling, never one array), and
    // the pair expansions below are JOINS, which distribute.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"key")
    val keyed = d
      .select($"doc_id", $"lang", $"sh", array_sort($"sh").as("key"))
      .withColumn("rep", min($"doc_id").over(w))
      .withColumn("csize", count(lit(1)).over(w))
      .drop("key")
    // (rep, member) — slim: two longs + lang per doc
    val memb = keyed.select($"rep", $"lang", $"doc_id", $"csize")

    val posts = keyed.filter($"doc_id" === $"rep")
      .select($"rep", $"lang", $"csize", explode($"sh").as("shingle"))
    // df counts DOCUMENTS (Σ class sizes), not classes — the cap
    // semantics are unchanged by the collapse
    val hot = posts.groupBy($"lang", $"shingle")
      .agg(sum($"csize").as("df"))
      .filter($"df" > maxDf)
      .select($"lang", $"shingle")
    val kept = posts.join(broadcast(hot), Seq("lang", "shingle"), "left_anti")
    val sizes = kept.groupBy($"rep").agg(count(lit(1)).as("n"))

    val repPairs = kept
      .select($"lang", $"rep".as("a_rep"), $"shingle")
      .join(kept.select($"lang".as("b_lang"), $"rep".as("b_rep"),
          $"shingle".as("b_shingle")),
        $"lang" === $"b_lang" && $"shingle" === $"b_shingle" &&
          $"a_rep" < $"b_rep")
      .groupBy($"a_rep", $"b_rep", $"lang")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"rep".as("a_rep"), $"n".as("a_n")), "a_rep")
      .join(sizes.select($"rep".as("b_rep"), $"n".as("b_n")), "b_rep")

    // cross-class expansion: every member-pair inherits the class-level
    // (inter, a_n, b_n). Two joins, output-sized and task-distributed
    // (AQE skew-split applies); the id-order convention (a_id < b_id)
    // swaps the sides where a member of the larger-rep class has the
    // smaller id.
    val cross = repPairs
      .join(memb.select($"rep".as("a_rep"), $"doc_id".as("x")), "a_rep")
      .join(memb.select($"rep".as("b_rep"), $"doc_id".as("y")), "b_rep")
      .select(
        least($"x", $"y").as("a_id"), greatest($"x", $"y").as("b_id"),
        $"lang",
        $"inter",
        when($"x" < $"y", $"a_n").otherwise($"b_n").as("a_n"),
        when($"x" < $"y", $"b_n").otherwise($"a_n").as("b_n"))

    // intra-class expansion: twins share the whole kept shingle set, so
    // inter = a_n = b_n = n. Classes whose kept set is empty never enter
    // the direct form's pair frame — excluded here too (inner join on
    // sizes keeps only reps with kept postings). A member self-join, not
    // a per-row explode²: output is inherently O(csize²) — identical to
    // the direct form's rows — but builds as join output across tasks.
    val intra = memb.filter($"csize" >= 2)
      .join(sizes, "rep")
      .select($"rep", $"lang", $"n", $"doc_id".as("x"))
      .join(memb.select($"rep", $"doc_id".as("y")), Seq("rep"))
      .filter($"x" < $"y")
      .select($"x".as("a_id"), $"y".as("b_id"), $"lang",
        $"n".as("inter"), $"n".as("a_n"), $"n".as("b_n"))

    cross.unionByName(intra)
  }

  private val twinClassCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val twinMemberCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Class membership (rep, doc_id) of the twinClasses quotient — the
    * expansion side, for quotient-form graph analytics that emit
    * PER-DOCUMENT rows (GraphQueries.pairPagerankFixed). Same keying
    * pass as twinClasses, session-cached. */
  def twinMembers(s: SparkSession, dir: String): DataFrame =
    twinMemberCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      val d = shingleFrame(shingleTokens(s, dir))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"key")
      graft.Caches.pin(
        d.withColumn("key", array_sort($"sh"))
          .withColumn("rep", min($"doc_id").over(w))
          .select($"rep", $"doc_id"))
    })

  /** Twin classes of the near-dup pair universe: one row per class of
    * documents with IDENTICAL (lang, distinct-shingle-set) content —
    * (rep = min doc_id, lang, csize, survived), where `survived` means
    * the class has ≥ 1 shingle under the df cap (exactly when the pair
    * frame gives the class intra edges and cross edges). The pair graph
    * is by construction the BLOW-UP of its twin quotient — twins have
    * identical adjacency because Jaccard depends only on class
    * contents — which is what lets graph analytics that are non-linear
    * in clique mass (triangles) run on the quotient with closed-form
    * expansion (GraphQueries.pairTriangles). Session-cached: the class
    * pass costs one shingle shuffle over the corpus. */
  def twinClasses(s: SparkSession, dir: String): DataFrame =
    twinClassCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      val d = shingleFrame(shingleTokens(s, dir))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"key")
      val keyed = d
        .withColumn("key", array_sort($"sh"))
        .withColumn("rep", min($"doc_id").over(w))
        .withColumn("csize", count(lit(1)).over(w))
      val reps = keyed.filter($"doc_id" === $"rep")
      val posts = reps.select($"lang", $"rep", $"csize",
        explode($"sh").as("shingle"))
      val hot = posts.groupBy($"lang", $"shingle")
        .agg(sum($"csize").as("df"))
        .filter($"df" > NearDupMaxDf)
        .select($"lang", $"shingle")
      val surv = posts
        .join(broadcast(hot), Seq("lang", "shingle"), "left_anti")
        .select($"rep").distinct()
        .withColumn("survived", lit(true))
      graft.Caches.pin(
        reps.select($"rep", $"lang", $"csize")
          .join(surv, Seq("rep"), "left_outer")
          .select($"rep", $"lang", $"csize",
            coalesce($"survived", lit(false)).as("survived")))
    })

  def ngramJaccardPairsOn(tokens: DataFrame, threshold: Double,
      maxDf: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    postingPairCounts(tokens, maxDf)
      .select($"a_id", $"b_id", $"lang",
        ($"inter".cast("double") / ($"a_n" + $"b_n" - $"inter").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** Containment near-duplicate pairs (q_containment_pairs): per-side
    * containment |A∩B|/|A| and |A∩B|/|B| over the same blocked shingle
    * postings as q_ngram_jaccard. Containment is the measure QUOTE
    * INCLUSION needs: a short document embedded verbatim in a long one
    * has containment ≈ 1 on the short side but Jaccard ≈ |short|/|long|
    * — far below any sane near-dup threshold, so symmetric-Jaccard
    * dedup ships the duplicated passage into training twice. Rows whose
    * Jaccard sits below the q_ngram_jaccard threshold are flagged
    * `quote_inclusion`: exactly the pairs the Jaccard tier misses. */
  def containmentPairs(s: SparkSession, dir: String,
      threshold: Double = 0.4, maxDf: Int = NearDupMaxDf): DataFrame =
    containmentPairsOn(shingleTokens(s, dir), threshold, maxDf)

  /** containmentPairs on an arbitrary (doc_id, lang, t) tokens frame. */
  def containmentPairsOn(tokens: DataFrame, threshold: Double,
      maxDf: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    postingPairCounts(tokens, maxDf)
      .select($"a_id", $"b_id", $"lang", $"inter", $"a_n", $"b_n",
        ($"inter".cast("double") / $"a_n".cast("double")).as("cont_a"),
        ($"inter".cast("double") / $"b_n".cast("double")).as("cont_b"),
        ($"inter".cast("double") / ($"a_n" + $"b_n" - $"inter").cast("double"))
          .as("jaccard"))
      .filter(greatest($"cont_a", $"cont_b") >= threshold)
      .withColumn("quote_inclusion", $"jaccard" < 0.12)
      .orderBy($"a_id", $"b_id")
  }

  /** Per-source corpus diversity — the data-mixing diagnostic read
    * BEFORE choosing mixture weights (sourceMix): how much lexical
    * variety each source actually contributes. Exact distinct counts via
    * the two-phase shape — groupBy(source, item) partial-agg combines
    * in the map task, then the per-source rollup touches only distinct
    * items — so the shuffle carries the (source, item) vocabulary, never
    * the corpus token stream. Type-token ratio is one IEEE division of
    * exact integers (bit-reproducible cross-engine). */
  def sourceDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val tok = docs.select($"source", explode(toks($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"source").agg(sum($"c").as("n_tokens"),
        count(lit(1)).as("distinct_tokens"))
    val bg = docs.select($"source",
        explode(bigramShingles(toks($"text"))).as("b"))
      .groupBy($"source", $"b").agg(count(lit(1)).as("c"))
      .groupBy($"source").agg(count(lit(1)).as("distinct_bigrams"))
    docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .join(tok, "source").join(bg, "source")
      .select($"source", $"n_docs", $"n_tokens", $"distinct_tokens",
        $"distinct_bigrams",
        ($"distinct_bigrams".cast("double") / $"n_tokens".cast("double"))
          .as("bigram_diversity"))
      .orderBy($"source")
  }

  /** Incremental near-dup ingest: n-gram Jaccard pairs restricted to
    * pairs touching a NEW batch (`isNew` marks batch membership) — the
    * nightly-ingest decision "which arriving docs duplicate the standing
    * corpus (or each other)?" without re-running the corpus×corpus
    * self-join.
    *
    * Scale shape: the standing inverted index is PROBED, not
    * self-joined — postings are first semi-join-pruned to the shingles
    * the batch actually contains, so pairing work is Σ_batch-shingles df
    * (linear in the batch, bounded per shingle by the df cap), never
    * corpus². On a cluster the posting table would be bucketed on
    * (lang, shingle) (sources.Bucketing), making the probe a
    * co-located join with no index-side shuffle. Pair semantics match
    * ngramJaccardPairsOn exactly over the same df-capped universe:
    * old×new pairs appear once (old side from the index, new side from
    * the batch), new×new pairs are canonicalized by id, and the
    * Jaccard arithmetic is the identical single IEEE division.
    */
  def ngramJaccardIncrementalOn(tokens: DataFrame, isNew: Column,
      threshold: Double, maxDf: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    // same adaptive exact-twin valve as postingPairCounts: the r11 30×
    // twin-replica decade measured the direct probe at 42× for 30× data
    // (each batch shingle's index df AND batch df multiply by the dup
    // factor, so probe mass grows with its square). Same (frame, key) as
    // postingPairCounts' probe → the DupProbe memo shares ONE pass.
    val dupFactor =
      graft.operators.DupProbe.dupFactor(tokens, $"lang", $"t")
    val d = tokens
      .select($"doc_id", $"lang", isNew.as("is_new"),
        array_distinct(transform(bigramShingles($"t"), sh => xxhash64(sh)))
          .as("sh"))
    if (dupFactor < CollapseDupFactor)
      ngramJaccardIncrementalDirect(d, threshold, maxDf)
    else
      ngramJaccardIncrementalCollapsed(d, threshold, maxDf)
  }

  /** The direct index-probe form — optimal when exact twins are rare. */
  private[queries] def ngramJaccardIncrementalDirect(d: DataFrame,
      threshold: Double, maxDf: Int): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val posts = d.select($"lang", $"doc_id", $"is_new",
      explode($"sh").as("shingle"))
    val hot = posts.groupBy($"lang", $"shingle")
      .agg(count(lit(1)).as("df"))
      .filter($"df" > maxDf)
      .select($"lang", $"shingle")
    val kept = posts.join(broadcast(hot), Seq("lang", "shingle"), "left_anti")
    val sizes = kept.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val batch = kept.filter($"is_new")
      .select($"lang".as("b_lang"), $"doc_id".as("b_id"),
        $"shingle".as("b_shingle"))
    // the probe: index postings for batch shingles only
    val probed = kept.join(
      batch.select($"b_lang".as("lang"), $"b_shingle".as("shingle")).distinct(),
      Seq("lang", "shingle"), "left_semi")
    probed
      .join(batch,
        $"lang" === $"b_lang" && $"shingle" === $"b_shingle" &&
          (!$"is_new" || $"doc_id" < $"b_id"))
      .select($"lang",
        least($"doc_id", $"b_id").as("a_id"),
        greatest($"doc_id", $"b_id").as("b_id"))
      .groupBy($"a_id", $"b_id", $"lang")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"doc_id".as("a_id"), $"n".as("a_n")), "a_id")
      .join(sizes.select($"doc_id".as("b_id"), $"n".as("b_n")), "b_id")
      .select($"a_id", $"b_id", $"lang",
        ($"inter".cast("double") / ($"a_n" + $"b_n" - $"inter").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** The twin-collapsed incremental form: the probe runs rep-level on a
    * class being "batch" (≥1 new member), then class pairs expand into
    * exactly the member pairs the direct form emits — pairs touching
    * ≥1 new doc, canonical a_id < b_id:
    *  - cross-class (c,d): new_c × all_d  ∪  old_c × new_d (each
    *    qualifying unordered pair once);
    *  - intra-class: new × old ∪ new × new (x < y), at the identical
    *    n/(n+n−n) IEEE division (exactly 1.0) the direct form computes
    *    for twin pairs, for classes that survive the df cap (n ≥ 1). */
  private[queries] def ngramJaccardIncrementalCollapsed(d: DataFrame,
      threshold: Double, maxDf: Int): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val wTwin = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"key")
    val keyed = d
      .withColumn("key", array_sort($"sh"))
      .withColumn("rep", min($"doc_id").over(wTwin))
      .withColumn("csize", count(lit(1)).over(wTwin))
      .withColumn("n_new",
        sum(when($"is_new", 1L).otherwise(0L)).over(wTwin))
      .drop("key")
    val memb = keyed.select($"rep", $"doc_id", $"is_new")
    val reps = keyed.filter($"doc_id" === $"rep")
      .select($"rep", $"lang", $"sh", $"csize", ($"n_new" >= 1).as("is_batch"))

    val posts = reps.select($"lang", $"rep", $"csize", $"is_batch",
      explode($"sh").as("shingle"))
    // df counts DOCUMENTS (Σ class sizes) — cap semantics unchanged
    val hot = posts.groupBy($"lang", $"shingle")
      .agg(sum($"csize").as("df"))
      .filter($"df" > maxDf)
      .select($"lang", $"shingle")
    val kept = posts.join(broadcast(hot), Seq("lang", "shingle"), "left_anti")
    val sizes = kept.groupBy($"rep").agg(count(lit(1)).as("n"))
    val batch = kept.filter($"is_batch")
      .select($"lang".as("b_lang"), $"rep".as("b_rep"),
        $"shingle".as("b_shingle"))
    val probed = kept.join(
      batch.select($"b_lang".as("lang"), $"b_shingle".as("shingle")).distinct(),
      Seq("lang", "shingle"), "left_semi")
    val repPairs = probed
      .join(batch,
        $"lang" === $"b_lang" && $"shingle" === $"b_shingle" &&
          (!$"is_batch" || $"rep" < $"b_rep"))
      .select($"lang",
        least($"rep", $"b_rep").as("a_rep"),
        greatest($"rep", $"b_rep").as("b_rep"))
      .groupBy($"a_rep", $"b_rep", $"lang")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"rep".as("a_rep"), $"n".as("a_n")), "a_rep")
      .join(sizes.select($"rep".as("b_rep"), $"n".as("b_n")), "b_rep")
      .select($"a_rep", $"b_rep", $"lang",
        ($"inter".cast("double") / ($"a_n" + $"b_n" - $"inter").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= threshold)

    val membNew = memb.filter($"is_new")
    val membOld = memb.filter(!$"is_new")
    def expand(aSide: DataFrame, bSide: DataFrame): DataFrame = repPairs
      .join(aSide.select($"rep".as("a_rep"), $"doc_id".as("x")), "a_rep")
      .join(bSide.select($"rep".as("b_rep"), $"doc_id".as("y")), "b_rep")
      .select(least($"x", $"y").as("a_id"),
        greatest($"x", $"y").as("b_id"), $"lang", $"jaccard")
    val cross = expand(membNew, memb).unionByName(expand(membOld, membNew))

    val intraCls = reps
      .filter($"csize" >= 2 && $"is_batch")
      .join(sizes, "rep")
      .select($"rep", $"lang",
        ($"n".cast("double") / ($"n" + $"n" - $"n").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= threshold)
    val intraNewOld = intraCls
      .join(membNew.select($"rep", $"doc_id".as("x")), "rep")
      .join(membOld.select($"rep", $"doc_id".as("y")), "rep")
      .select(least($"x", $"y").as("a_id"),
        greatest($"x", $"y").as("b_id"), $"lang", $"jaccard")
    val intraNewNew = intraCls
      .join(membNew.select($"rep", $"doc_id".as("x")), "rep")
      .join(membNew.select($"rep", $"doc_id".as("y")), "rep")
      .filter($"x" < $"y")
      .select($"x".as("a_id"), $"y".as("b_id"), $"lang", $"jaccard")

    cross.unionByName(intraNewOld).unionByName(intraNewNew)
  }

  /** q_ingest_neardup: incremental dedup of a simulated nightly batch
    * (doc_id ≡ 7 mod 10 — a 10% ingest) against the standing corpus.
    * Real pipelines swap the predicate for an ingest-date partition
    * column; the dataflow is unchanged. */
  def ingestNearDup(s: SparkSession, dir: String,
      threshold: Double = 0.08): DataFrame = {
    import s.implicits._
    ngramJaccardIncrementalOn(shingleTokens(s, dir),
        col("doc_id") % 10 === 7, threshold, maxDf = NearDupMaxDf)
      .orderBy($"a_id", $"b_id")
  }

  /** Top-k tokens per language: generator (explode) → map-side-combinable
    * count agg → TWO-PHASE top-k. The wordcount shape — at 100 TB the
    * explode never leaves its map task (partial agg combines before the
    * shuffle on the (lang, token) key); the top-k then runs first within
    * (lang, token-hash bucket) — spreading the vocabulary over 32×|langs|
    * window partitions instead of one task per language — and finally
    * over the ≤ 32k surviving candidates per language. Results are
    * identical to the single-window form: every global top-k token is
    * top-k within its own bucket, and both phases share the
    * (cnt desc, token asc) deterministic order. */
  def wordTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val buckets = 32
    val wB = Window.partitionBy($"lang", $"bucket")
      .orderBy($"cnt".desc, $"token".asc)
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"token".asc)
    Tables.documents(s, dir)
      .select($"lang", explode(toks($"text")).as("token"))
      .groupBy($"lang", $"token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", pmod(xxhash64($"token"), lit(buckets)))
      .withColumn("rb", row_number().over(wB))
      .filter($"rb" <= k)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"lang", $"token", $"cnt", $"rnk")
      .orderBy($"lang", $"rnk")
  }

  /** Top-k bigrams per language — wordTopK lifted to 2-grams, the phrase-
    * level vocabulary diagnostic (boilerplate and templated text surface
    * as hot bigrams long before hot unigrams). Same two-phase top-k: the
    * bucketed window spreads the bigram vocabulary — far larger than the
    * unigram one at real scale — over 32×|langs| partitions before the
    * final per-lang rank. */
  def bigramTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import s.implicits._
    val buckets = 32
    val wB = Window.partitionBy($"lang", $"bucket")
      .orderBy($"cnt".desc, $"bigram".asc)
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"bigram".asc)
    Tables.documents(s, dir)
      .select($"lang", explode(TextOps.shingles(toks($"text"), 2)).as("bigram"))
      .groupBy($"lang", $"bigram")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", pmod(xxhash64($"bigram"), lit(buckets)))
      .withColumn("rb", row_number().over(wB))
      .filter($"rb" <= k)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"lang", $"bigram", $"cnt", $"rnk")
      .orderBy($"lang", $"rnk")
  }

  /** Approximate heavy-hitter words per language via the graft-native
    * Misra–Gries aggregate (functions.FrequentItems) — the
    * sketch-shuffle alternative to wordTopK's exact two-phase top-k:
    * map tasks ship one ≤capacity summary per (partition, lang) instead
    * of the full (lang, token) count table, so shuffle volume is bounded
    * by cluster width, not vocabulary size (the win when the
    * "vocabulary" is raw n-grams or URLs at 100 TB). Estimates carry
    * the mergeable-summaries contract est ≤ true ≤ est + err (pinned in
    * SketchAggsSpec together with heavy-hitter completeness); sketch
    * state is Spark-side, so like q_bottomk_sample this is rows-only
    * for the driver. capacity 16 < the corpus's 31-word vocabulary, so
    * the sketch truncates for real here. */
  def frequentWords(s: SparkSession, dir: String,
      capacity: Int = 16, k: Int = 10): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"est".desc, $"word".asc)
    Tables.documents(s, dir)
      .select($"lang", explode(toks($"text")).as("word"))
      .groupBy($"lang")
      .agg(graft.functions.SketchAggs.frequentItems($"word", capacity)
        .as("fi"))
      .select($"lang", explode($"fi").as("e"))
      .select($"lang", $"e.item".as("word"), $"e.est".as("est"),
        $"e.err".as("err"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .orderBy($"lang", $"rnk")
  }

  /** Top-k terms per document by TF-IDF, computed relationally (the
    * reference's TF-IDF featurization — Predictor.scala:123-130 HashingTF
    * + IDF — re-expressed as explode → agg → join so it is oracle-checkable;
    * the MLlib pipeline twin with the canonical log-IDF lives in
    * graft.ml.TfIdf).
    *
    * IDF here is the RATIONAL form (N+1)/(df+1) rather than
    * ln((N+1)/(df+1)): IEEE division and multiplication are exactly
    * rounded, so the score doubles are bit-identical in any engine, while
    * libm `log` differs in the last ulp across runtimes and would make the
    * per-doc ranking oracle flaky. Monotone in df, so rankings for equal
    * tf agree with the log form.
    *
    * Scale shape: tf agg is map-side combinable on (doc_id, term); df agg
    * likewise on term (one row per distinct term); the scores join
    * shuffles on `term` (AQE may broadcast the df side when the
    * vocabulary is small); the final top-k is a row_number window over
    * (doc_id) partitions — one row per (doc, distinct term), never per
    * occurrence. */
  def tfidfTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // one cheap metadata-only count job for the corpus size scalar
    val n = docs.count()
    val tf = docs
      .select($"doc_id", explode(toks($"text")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    tf.join(df, "term")
      .select($"doc_id", $"term", $"tf", $"df",
        ($"tf".cast("double") *
          (lit((n + 1).toDouble) / ($"df" + 1).cast("double"))).as("tfidf"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .orderBy($"doc_id", $"rnk")
  }

  /** BM25 top-k retrieval (q_bm25_topk): the ranking function RAG
    * pipelines use to pick training/grounding passages, as a relational
    * plan. The "query" is corpus-derived for determinism: the 8 terms at
    * document-frequency ranks 20–27 (df desc, term asc tie-break).
    *
    * Float parity with the DuckDB oracle follows the q_tfidf_topk
    * playbook: a RATIONAL idf (N−df+0.5)/(df+0.5) instead of libm ln
    * (exactly-rounded IEEE div only), every arithmetic node written in
    * the same shape on both sides, and the per-doc term-score sum folded
    * in SORTED TERM ORDER (sort_array + aggregate here, list(ORDER BY) +
    * list_reduce there) so double addition order — the one thing SQL
    * semantics leave unspecified — is pinned.
    *
    * Scale posture: tf/df/doclen are linear shuffles on their natural
    * keys; the 8-term query frame is broadcast into the tf join (a
    * per-term posting-list probe, never a corpus shuffle); the final
    * top-k is orderBy+limit, which Spark plans as TakeOrderedAndProject
    * — per-partition heaps and a k-row driver merge, no global sort
    * exchange at any corpus size. */
  def bm25TopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val toksD = docs.select($"doc_id", explode(toks($"text")).as("term"))
    val tf = toksD.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dl = toksD.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val tot = dl.agg(sum($"dl")).head.getLong(0)
    // avgdl via the same single IEEE division DuckDB performs
    val avgdl = tot.toDouble / n.toDouble
    // top-27-by-df via TakeOrderedAndProject (per-partition heaps), THEN
    // the rank window over just those 27 rows — the unbounded window
    // never sees the full vocabulary
    val wq = Window.orderBy($"df".desc, $"term".asc)
    val qterms = df.orderBy($"df".desc, $"term".asc).limit(27)
      .withColumn("r", row_number().over(wq))
      .filter($"r" >= 20 && $"r" <= 27)
      .select($"term", $"df")
    val idf = ((lit(n) - $"df").cast("double") + 0.5) /
      ($"df".cast("double") + 0.5)
    val ratio = $"dl".cast("double") / avgdl
    val denom = $"tf".cast("double") +
      lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * ratio)
    val perTerm = tf
      .join(broadcast(qterms), "term") // 8-row posting-list probe
      .join(dl, "doc_id")
      .select($"doc_id", $"term",
        (idf * ($"tf".cast("double") * 2.2) / denom).as("score"))
    val scored = perTerm
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"),
        aggregate(
          transform(sort_array(collect_list(struct($"term", $"score"))),
            x => x.getField("score")),
          lit(0.0), (acc, x) => acc + x).as("score"))
    scored.orderBy($"score".desc, $"doc_id".asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy($"score".desc, $"doc_id".asc)))
      .select($"rank", $"doc_id", $"n_terms", $"score")
      .orderBy($"rank")
  }

  /** Hybrid two-stage retrieval (q_hybrid_retrieval): the
    * lexical-then-semantic pattern production RAG rankers use — BM25
    * selects nCand candidates, an embedding-cosine pass reranks them.
    * The query vector is corpus-derived for determinism: the embedding
    * of the BM25 rank-1 document (doc_id ≡ vec_id in the testdata).
    *
    * Scale posture: stage 1 is the bm25TopK plan (linear shuffles +
    * TakeOrderedAndProject); stage 2 joins the DRIVER-BOUNDED candidate
    * frame (nCand rows, broadcast) against the embeddings table — one
    * corpus probe, no pairwise blow-up — and the rerank window sorts
    * ≤ nCand rows. Float parity: dot products via the same in-order
    * fold as q_cosine_topk, denominators in the same q_nrm * nrm shape
    * on both engines. */
  def hybridRetrieval(s: SparkSession, dir: String, nCand: Int = 50,
      k: Int = 10): DataFrame = {
    import s.implicits._
    import graft.queries.Embeddings.{dot, norm}
    // the candidate frame is DRIVER-BOUNDED by construction (nCand rows
    // out of a TakeOrderedAndProject), so collecting it is the scalar
    // pattern, not a distributed-operator smell — and inlining the
    // query vector as a LITERAL keeps the rerank free of the 1-row
    // cross join a broadcast scalar frame would need (which Catalyst
    // constant-folds into a nested-loop join, tripping the engine's
    // no-BNLJ invariant)
    val candRows = bm25TopK(s, dir, nCand)
      .select($"rank".as("bm25_rank"), $"doc_id", $"score".as("bm25"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val cand = candRows.toSeq.toDF("bm25_rank", "doc_id", "bm25")
    // Empty-corpus / missing-vector guard: the DuckDB oracle's empty
    // candidate (or empty query-vector) CTE cross-joins to an EMPTY
    // result — mirror that instead of throwing NoSuchElementException
    // from a driver-side .get/.head (ADVICE r10). The doc_id ≡ vec_id
    // invariant holds on the testdata; this is the off-corpus path.
    def emptyOut: DataFrame = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rerank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bm25_rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("bm25",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("cosine",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val top1IdOpt = candRows.find(_._1 == 1).map(_._2)
    if (top1IdOpt.isEmpty) return emptyOut
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val qRowOpt = emb.filter($"vec_id" === top1IdOpt.get).select($"v")
      .head(1).headOption
    if (qRowOpt.isEmpty) return emptyOut
    val q = qRowOpt.get.getSeq[Double](0)
    // same strict in-order fold as VectorExprs.DotProduct, so this
    // driver-side norm is bit-identical to norm(q_v) in-plan
    val qNrm = math.sqrt(q.foldLeft(0.0)((acc, x) => acc + x * x))
    emb.join(broadcast(cand), $"doc_id" === $"vec_id")
      .select($"bm25_rank", $"doc_id", $"bm25",
        (dot(typedLit(q), $"v") / (lit(qNrm) * norm($"v"))).as("cosine"))
      .withColumn("rerank", row_number().over(
        Window.orderBy($"cosine".desc, $"doc_id".asc)))
      .filter($"rerank" <= k)
      .select($"rerank", $"doc_id", $"bm25_rank", $"bm25", $"cosine")
      .orderBy($"rerank")
  }

  /** MMR diverse rerank (q_mmr_rerank): Maximal Marginal Relevance
    * (Carbonell & Goldstein 1998) over the BM25 candidate set — the
    * diversity-aware selection production RAG rankers run after
    * retrieval, so the k context passages aren't k near-copies of one
    * passage. Greedy: pick argmax rel; then repeatedly pick
    * argmax [λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)], ties by
    * doc_id asc. Query vector: the BM25 rank-1 doc's embedding (the
    * hybridRetrieval convention).
    *
    * Scale posture: the distributed work is stage 1 (the bm25TopK
    * plan) and the candidate vector fetch (one probe join); the greedy
    * loop runs driver-side on the DRIVER-BOUNDED candidate set (nCand
    * rows × dim doubles — the same class of driver state as a
    * collected centroid set), because MMR is inherently sequential in
    * k over ≤ nCand items.
    *
    * The query doc (BM25 rank 1) is the QUERY, not a candidate —
    * candidates are ranks 2..nCand. With the query doc inside the
    * candidate set, rel(d) ≡ sim(d, s₁) exactly (s₁ would be the query
    * doc itself), making every step-2 marginal identically zero at
    * λ = 1/2 and degenerating selection to id order — measured on the
    * real corpus before this exclusion.
    *
    * Float parity with the unrolled-greedy DuckDB oracle: rel and sim
    * are the exact in-order-fold cosines list_reduce computes (dot /
    * (sqrt(selfdot)·sqrt(selfdot)), one division); λ = 1/2 is dyadic,
    * so the marginal is two exact halvings and one subtraction;
    * max-over-selected is pure comparison. */
  def mmrRerank(s: SparkSession, dir: String, nCand: Int = 20,
      k: Int = 5, lambda: Double = 0.5): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val cand = bm25TopK(s, dir, nCand).select($"rank", $"doc_id")
      .join(emb, $"doc_id" === $"vec_id")
      .select($"rank", $"doc_id", $"v")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    def dotA(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val out = cand.find(_._1 == 1) match {
      case None => Seq.empty[(Int, Long, Double, Double)]
      case Some((_, _, q)) =>
        val qNrm = math.sqrt(dotA(q, q))
        // sorted by doc_id: iteration order never affects argmax results
        // (explicit tie-break below), only makes them reproducible
        val items = cand.filter(_._1 != 1).sortBy(_._2).map { case (_, id, v) =>
          (id, v, dotA(q, v) / (qNrm * math.sqrt(dotA(v, v))))
        }
        def sim(a: Array[Double], b: Array[Double]): Double =
          dotA(a, b) / (math.sqrt(dotA(a, a)) * math.sqrt(dotA(b, b)))
        val picked = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Double, Double)]
        val selectedVs = scala.collection.mutable.ArrayBuffer
          .empty[Array[Double]]
        val remaining = scala.collection.mutable.ArrayBuffer(items: _*)
        for (rank <- 1 to math.min(k, items.length)) {
          val scored = remaining.map { case (id, v, rel) =>
            val m = if (selectedVs.isEmpty) rel
              else lambda * rel -
                (1.0 - lambda) * selectedVs.map(sv => sim(v, sv)).max
            (id, v, rel, m)
          }
          val best = scored.minBy { case (id, _, _, m) => (-m, id) }
          picked += ((rank, best._1, best._3, best._4))
          selectedVs += best._2
          remaining --= remaining.filter(_._1 == best._1)
        }
        picked.toSeq
    }
    out.toDF("mmr_rank", "doc_id", "rel", "mmr_score")
      .orderBy($"mmr_rank")
  }

  /** Reciprocal Rank Fusion (q_rrf_fusion): the rank-based combiner
    * (Cormack, Clarke & Buettcher, SIGIR 2009) production retrieval
    * stacks run when fusing lexical and dense rankings —
    * rrf = Σᵢ 1/(k₀ + rankᵢ), k₀ = 60. Rank-based fusion is immune to
    * the scorers' incomparable scales (BM25 is unbounded, cosine is
    * [−1, 1]), which is why it beats weighted score sums on
    * uncalibrated scorers. Candidates: the BM25 top-20; the dense
    * ranking is cosine to the BM25 rank-1 doc's embedding (the
    * hybridRetrieval query convention — rank-1 plays the query and
    * ranks first in its own dense list).
    *
    * Float parity with the oracle: both ranks are INTEGERS, so
    * rrf = 1.0/(60 + r₁) + 1.0/(60 + r₂) is two IEEE divisions and one
    * add, replayed term-for-term (exponent-form 1.0e0 literals in the
    * SQL so DuckDB lexes DOUBLE, not DECIMAL).
    *
    * Scale posture: stage 1 is the distributed bm25TopK plan; the
    * fusion runs on the DRIVER-BOUNDED 20-row candidate set
    * (hybridRetrieval's scalar pattern — one probe join against
    * embeddings, two 20-row windows). */
  def rrfFusion(s: SparkSession, dir: String, nCand: Int = 20,
      k: Int = 10, k0: Int = 60): DataFrame = {
    import s.implicits._
    import graft.queries.Embeddings.{dot, norm}
    val candRows = bm25TopK(s, dir, nCand)
      .select($"rank".as("bm25_rank"), $"doc_id")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val cand = candRows.toSeq.toDF("bm25_rank", "doc_id")
    def emptyOut: DataFrame = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rrf_rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bm25_rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cos_rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("rrf",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val top1IdOpt = candRows.find(_._1 == 1).map(_._2)
    if (top1IdOpt.isEmpty) return emptyOut
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val qRowOpt = emb.filter($"vec_id" === top1IdOpt.get).select($"v")
      .head(1).headOption
    if (qRowOpt.isEmpty) return emptyOut
    val q = qRowOpt.get.getSeq[Double](0)
    val qNrm = math.sqrt(q.foldLeft(0.0)((acc, x) => acc + x * x))
    emb.join(broadcast(cand), $"doc_id" === $"vec_id")
      .select($"bm25_rank", $"doc_id",
        (dot(typedLit(q), $"v") / (lit(qNrm) * norm($"v"))).as("cosine"))
      .withColumn("cos_rank", row_number().over(
        Window.orderBy($"cosine".desc, $"doc_id".asc)))
      .withColumn("rrf",
        lit(1.0) / (lit(k0) + $"bm25_rank") +
          lit(1.0) / (lit(k0) + $"cos_rank"))
      .withColumn("rrf_rank", row_number().over(
        Window.orderBy($"rrf".desc, $"doc_id".asc)))
      .filter($"rrf_rank" <= k)
      .select($"rrf_rank", $"doc_id", $"bm25_rank", $"cos_rank", $"rrf")
      .orderBy($"rrf_rank")
  }

  /** Link-prediction candidate featurization — the reference p1 core
    * (double attribute join J1/J2 + feature derivation F1-F3 + label join
    * J3) on the documents table: candidate pairs blocked by source, token
    * overlap + metadata features, Jaccard-threshold label. */
  def linkpredPairs(s: SparkSession, dir: String): DataFrame =
    linkpredPairsUnsorted(s, dir).orderBy(col("a_id"), col("b_id"))

  /** linkpredPairs without the final global sort — for internal consumers
    * (graft.queries.Extended.linkpredE2e): the orderBy adds a range
    * exchange whose small output AQE coalesces to ONE partition, which
    * then serializes every downstream stage built on it. The sorted
    * variant exists only for oracle determinism. */
  def linkpredPairsUnsorted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Token sets are pre-hashed to xxhash64 longs ONCE per document (an
    // O(corpus) pass), so the O(pairs) array_intersect compares 8-byte
    // longs instead of hashing/comparing strings per pair — measured 5.6×
    // on the pair stage at sf0.1 (9.2 s → 1.6 s) with identical counts on
    // all 622k pairs. Set sizes and intersection counts are unchanged
    // unless xxhash64 collides within one document's ~100 tokens
    // (P ≈ 10⁻¹⁶ per doc) — the same determinism argument the minhash
    // operator rests on. At 100 TB the win compounds: pair count is
    // quadratic in block size while the hash pass stays linear.
    val d = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"lang", $"n_chars",
        array_distinct(transform(toks($"text"), t => xxhash64(t))).as("tset"))
    val a = d.select($"doc_id".as("a_id"), $"source",
      $"lang".as("a_lang"), $"n_chars".as("a_chars"), $"tset".as("a_t"))
    val b = d.select($"doc_id".as("b_id"), $"source".as("b_source"),
      $"lang".as("b_lang"), $"n_chars".as("b_chars"), $"tset".as("b_t"))
    // salted block self-join (operators.SkewJoin): `source` has ~10
    // distinct values — unsalted, each block's O(n²) pair set lands in
    // one task (same reasoning as Extended.multisetPairs)
    graft.operators.SkewJoin.salted(a, b,
        $"source" === $"b_source" && $"a_id" < $"b_id",
        saltOn = $"a_id", salts = Extended.PAIR_SALTS)
      .select($"a_id", $"b_id", $"source",
        size(array_intersect($"a_t", $"b_t")).as("common_tokens"),
        (size($"a_t") + size($"b_t")).as("sz"),
        when($"a_lang" === $"b_lang", 1).otherwise(0).as("same_lang"),
        abs($"a_chars" - $"b_chars").as("chars_diff"))
      .withColumn("jaccard",
        $"common_tokens".cast("double") /
          ($"sz" - $"common_tokens").cast("double"))
      .withColumn("label", when($"jaccard" >= 0.5, 1).otherwise(0))
      .select($"a_id", $"b_id", $"source", $"common_tokens", $"same_lang",
        $"chars_diff", $"jaccard", $"label")
  }

  /** Shared learned-BPE pipeline for the two q_bpe_* queries: one
    * histogram shuffle + driver-side merge learning (operators.Bpe
    * documents the scale shape), then distributed tokenization. 200
    * merges ≈ the corpus's whole productive pair mass at sf0.1 (the
    * vocabulary is small word salad); a production run would use 32k+. */
  private val bpeModels = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.Bpe.Model]

  private def bpeTokenized(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // session-memoized model (same pattern as Embeddings' shared exact
    // pair frame): learning is deterministic, so the two q_bpe_* queries
    // share one histogram pass instead of re-learning per query
    val model = bpeModels.getOrElseUpdate((s, dir),
      graft.operators.Bpe.learn(docs, "text", vocabSize = 200))
    graft.operators.Bpe.tokenize(docs, "text", "doc_id", model)
  }

  /** ORACLE-checked BPE gate (q_bpe_roundtrip): detokenizing the learned
    * subword stream must reproduce the whitespace-normalized text
    * exactly, doc by doc. DuckDB never runs BPE — it recomputes the
    * normalized text independently, so any tokenizer defect that drops,
    * duplicates, or corrupts a single codepoint anywhere in the corpus
    * breaks the bit-match. (Sentinel collision is impossible here: the
    * corpus has no `<` characters, pinned by BpeSpec on the fixture.) */
  def bpeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeTokenized(s, dir)
      .select($"doc_id",
        rtrim(replace(concat_ws("", $"tokens"),
          lit(graft.operators.Bpe.EndOfWord), lit(" "))).as("detok"))
      .orderBy($"doc_id")
  }

  /** Corpus stats for the learned tokenizer (q_bpe_tokens): per-source
    * doc/word/subword-token totals plus the corpus-wide compression
    * ratio every token-budget computation starts from.
    *
    * ORACLE-checked since r12 (VERDICT r11 #3): the learned merges are
    * driver-known after fit, so Verify emits them as a LITERAL ranks
    * table inside the oracle SQL (prepareBpeOracle) and DuckDB REPLAYS
    * the greedy lowest-rank-first encode per distinct word with a
    * recursive CTE — the per-source totals become independently
    * recomputable; only the ranks table itself is trusted from the fit
    * (it is pinned exactly on a hand-computable corpus in BpeSpec). */
  def bpeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"source",
        size(filter(toks($"text"), w => length(w) > 0)).as("n_words"),
        length(replace($"text", lit(" "), lit(""))).as("n_cp"))
    bpeTokenized(s, dir).join(docs, "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("total_words"),
        sum($"n_cp").as("total_codepoints"),
        sum($"n_tokens").as("total_tokens"))
      // tokens per 100 codepoints, integer so reruns bit-match; the
      // nullif keeps an all-whitespace source NULL on both sides
      // instead of a div-by-zero (Spark) vs NaN-cast error (DuckDB)
      .withColumn("tokens_per_100cp",
        (lit(100) * $"total_tokens" /
          nullif($"total_codepoints", lit(0L))).cast("long"))
      .orderBy($"source")
  }

  /** The q_bpe_tokens oracle SQL, set by Verify via prepareBpeOracle
    * BEFORE the oracle dump (the SQL embeds corpus-learned state, so it
    * cannot be a static literal like every other entry). Absent — e.g.
    * when Verify's pre-learn failed or never ran — the query falls back
    * to the pre-r12 rows-only status. */
  @volatile private var bpeOracle: Option[String] = None

  def bpeOracleSqlEntry: Map[String, String] =
    bpeOracle.map("q_bpe_tokens" -> _).toMap

  /** Learn (or reuse the session-memoized) BPE model for `dir` and build
    * the replay oracle. Deterministic: Bpe.learn is a pure function of
    * the corpus, so the ranks Verify embeds are exactly the ranks the
    * q_bpe_tokens run will use (the bpeModels memo shares the instance). */
  def prepareBpeOracle(s: SparkSession, dir: String): Unit = {
    // Clear first: if learn/build throws below, a previous corpus's
    // oracle must not survive in this global — Verify catches and
    // continues, and a stale entry would dump a wrong-corpus oracle
    // instead of the documented rows-only fallback.
    bpeOracle = None
    val model = bpeModels.getOrElseUpdate((s, dir),
      graft.operators.Bpe.learn(Tables.documents(s, dir), "text",
        vocabSize = 200))
    bpeOracle = buildBpeOracleSql(model)
  }

  /** The DuckDB replay: a recursive CTE applies the greedy
    * lowest-rank-first (leftmost on equal rank — ranks are unique by
    * construction) merge loop to every DISTINCT corpus word, exactly
    * Bpe.encodeWord's semantics; per-word token counts then join back to
    * the word instances for per-source totals. Symbols are matched
    * through a rank map keyed `left ∥ US ∥ right` (US = chr(31), absent
    * from the corpus — guarded below); 2147483647 is the "no merge"
    * sentinel, matching encodeWord's Int.MaxValue. Returns None when the
    * merges are unrepresentable (empty, control chars) — rows-only then. */
  private[graft] def buildBpeOracleSql(
      model: graft.operators.Bpe.Model): Option[String] = {
    val ms = model.merges
    val unsafe = ms.exists(m => (m.left + m.right).exists(_ < ' '))
    if (ms.isEmpty || unsafe) None
    else {
      def esc(x: String) = x.replace("'", "''")
      val values = ms
        .map(m => s"('${esc(m.left)}','${esc(m.right)}',${m.rank})")
        .mkString(", ")
      Some(s"""WITH RECURSIVE
        |merges(l, r, rank) AS (VALUES $values),
        |rankmap AS (
        |  SELECT map_from_entries(list(struct_pack(
        |    k := l || chr(31) || r, v := rank))) AS m
        |  FROM merges),
        |docw AS (
        |  SELECT doc_id, source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |  FROM documents),
        |words AS (SELECT DISTINCT w FROM docw),
        |init AS (
        |  SELECT w, list_append(
        |    list_transform(range(1, length(w) + 1), i -> w[i:i]),
        |    '</w>') AS syms
        |  FROM words),
        |enc(w, syms) AS (
        |  SELECT w, syms FROM init
        |  UNION ALL
        |  SELECT w, list_concat(list_concat(
        |      syms[:pos-1], [syms[pos] || syms[pos+1]]), syms[pos+2:])
        |  FROM (
        |    SELECT w, syms, pr, list_position(pr, list_min(pr)) AS pos
        |    FROM (
        |      SELECT e.w, e.syms,
        |        list_transform(range(1, len(e.syms)), i ->
        |          coalesce(map_extract(rm.m,
        |            e.syms[i] || chr(31) || e.syms[i+1])[1],
        |            2147483647)) AS pr
        |      FROM enc e, rankmap rm) t) u
        |  WHERE coalesce(list_min(pr), 2147483647) < 2147483647),
        |tok AS (
        |  SELECT e.w, len(e.syms) AS n_tokens
        |  FROM enc e, rankmap rm
        |  WHERE coalesce(list_min(list_transform(range(1, len(e.syms)),
        |    i -> coalesce(map_extract(rm.m,
        |      e.syms[i] || chr(31) || e.syms[i+1])[1], 2147483647))),
        |    2147483647) = 2147483647),
        |doc_tok AS (
        |  SELECT dw.doc_id, sum(t.n_tokens) AS n_tokens
        |  FROM docw dw JOIN tok t USING (w) GROUP BY dw.doc_id),
        |per_doc AS (
        |  SELECT d.doc_id, d.source,
        |    len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS n_words,
        |    length(replace(d.text, ' ', '')) AS n_cp,
        |    coalesce(dt.n_tokens, 0) AS n_tokens
        |  FROM documents d LEFT JOIN doc_tok dt USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  CAST(sum(n_cp) AS BIGINT) AS total_codepoints,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(trunc(CAST(100 * CAST(sum(n_tokens) AS BIGINT) AS DOUBLE)
        |    / CAST(NULLIF(sum(n_cp), 0) AS DOUBLE)) AS BIGINT)
        |    AS tokens_per_100cp
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin)
    }
  }

  /** Exact-substring dedup at stride-1 span granularity (the RefinedWeb /
    * Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    * Better" signal, at n-token-window resolution instead of suffix
    * arrays): a span is "duplicated" when its exact n-token text occurs
    * anywhere else in the corpus, and a document whose duplicated-span
    * mass reaches 1/2 of its spans is a drop candidate. chunkDedup's
    * fixed non-overlapping chunks miss dupes that straddle a boundary;
    * stride-1 spans catch every shared run of ≥ n tokens.
    *
    * Dataflow: one shingle explode (slim (doc_id, md5) rows — the 100 TB
    * shuffle key is the 16-byte hash, never span text), a window count
    * over the hash (one shuffle, no self-join, no second corpus scan),
    * the per-doc rollup, and a left join back so span-less short docs
    * keep a row. The drop verdict compares integers (n_dup·2 ≥ n_spans),
    * not doubles; dup_frac is one exact IEEE division, null when the doc
    * has no spans. */
  def spanDedup(s: SparkSession, dir: String, n: Int = 16): DataFrame = {
    import s.implicits._
    val spans = Tables.documents(s, dir)
      .select($"doc_id", toks($"text").as("t"))
      .select($"doc_id", explode(TextOps.shingles($"t", n)).as("sp"))
      .select($"doc_id", md5($"sp").as("h"))
    val per = spans
      .withColumn("c", count(lit(1)).over(Window.partitionBy($"h")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when($"c" > 1, 1L).otherwise(0L)).as("n_dup"))
    Tables.documents(s, dir).select($"doc_id")
      .join(per, Seq("doc_id"), "left_outer")
      .select($"doc_id",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"n_dup", lit(0L)).as("n_dup"))
      .select($"doc_id", $"n_spans", $"n_dup",
        when($"n_spans" > 0,
          $"n_dup".cast("double") / $"n_spans".cast("double")).as("dup_frac"),
        when($"n_spans" > 0 && $"n_dup" * 2 >= $"n_spans", "drop")
          .otherwise("keep").as("verdict"))
      .orderBy($"doc_id")
  }

  /** Count-Min evidence query (q_cm_words): per-language frequency
    * estimates for a fixed probe vocabulary from the partition-invariant
    * CM sketch (functions.SketchAggs.cmEstimate), joined against the
    * exact counts so the driver sees the overcount per round. est ≥
    * true is the sketch's hard guarantee (overcount can only add);
    * estimates depend on the seeded hash family, so this is rows-only —
    * the invariance and error contracts are pinned in SketchAggsSpec.
    * The absent probe pins the no-hit path. At scale the sketch is the
    * point: probe-set frequency over a 100 TB token stream in
    * width×depth longs per group, one map-combinable pass, no
    * (group, word) shuffle. */
  def cmWords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probes = Seq("the", "table", "data", "spark", "query", "zzz_absent")
    val words = Tables.documents(s, dir)
      .select($"lang", explode(toks($"text")).as("w"))
    val est = words.groupBy($"lang")
      .agg(graft.functions.SketchAggs.cmEstimate($"w", probes).as("ests"))
      .select($"lang", explode($"ests").as("e"))
      .select($"lang", $"e.item".as("item"), $"e.est".as("est"))
    val exact = words.filter($"w".isInCollection(probes))
      .groupBy($"lang", $"w".as("item"))
      .agg(count(lit(1)).as("true_count"))
    est.join(exact, Seq("lang", "item"), "left_outer")
      .select($"lang", $"item", $"est",
        coalesce($"true_count", lit(0L)).as("true_count"),
        ($"est" - coalesce($"true_count", lit(0L))).as("overcount"))
      .orderBy($"lang", $"item")
  }

  /** Winnowing fingerprints over a (doc_id, t: array<string>) token
    * frame (Schleimer, Wilkerson & Aiken 2003, "Winnowing: Local
    * Algorithms for Document Fingerprinting" — the MOSS algorithm):
    * hash every k-token span, slide a window of w consecutive span
    * hashes, select each window's minimum. The selected hashes (deduped)
    * are the document's fingerprints, expected density 2/(w+1) of the
    * spans, with the paper's guarantee: any shared run of ≥ w+k−1 tokens
    * yields at least one SHARED fingerprint (pinned in the spec). This
    * is the principled sparsification between spanDedup (every span —
    * exact but posting-heavy) and minhashNearDup (doc-level only):
    * substring-granular detection at a fraction of the postings.
    *
    * Window-min selection (not the paper's stateful robust variant,
    * which is inherently sequential per document and selects a strict
    * subset) keeps the operator a pure per-window function: one window
    * min keyed doc_id, one distinct — both shuffle 16-byte md5s. Min
    * over lowercase-hex md5 is a binary string compare, identical in
    * every engine. */
  def winnowFingerprintsOn(tokens: DataFrame, k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, s"need positive k/w, got k=$k w=$w")
    val s = tokens.sparkSession
    import s.implicits._
    val sp = tokens
      .select($"doc_id", TextOps.shingles($"t", k).as("shs"))
      .select($"doc_id", size($"shs").as("n_spans"),
        posexplode($"shs").as(Seq("pos", "sp")))
      .select($"doc_id", $"n_spans", $"pos", md5($"sp").as("h"))
    val win = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.currentRow, w - 1)
    sp.withColumn("f", min($"h").over(win))
      .filter($"pos" <= $"n_spans" - w) // full windows only (0-based)
      .select($"doc_id", $"f").distinct()
  }

  private val winnowCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int), DataFrame]

  /** Session-scoped materialized winnow fingerprint frame (the same
    * shared-CTE pattern as scoredNearDupPairs): three queries consume it
    * (q_winnow, q_winnow_pairs, q_winnow_dedup) and the shingle explode
    * + window min that produces it dominates their cost. One slim row
    * per (doc, fingerprint) — ~2/(w+1) of the span count. Dropped by
    * invalidateCache alongside the pair frame. */
  private def winnowFrame(s: SparkSession, dir: String, k: Int,
      w: Int): DataFrame = {
    import s.implicits._
    winnowCache.getOrElseUpdate((s, dir, k, w),
      graft.Caches.pin(winnowFingerprintsOn(
        Tables.documents(s, dir).select($"doc_id", toks($"text").as("t")),
        k, w)))
  }

  /** Per-document winnowing rollup: span count, fingerprint count, and
    * an order-insensitive digest of the fingerprint set (md5 of the
    * sorted concatenation — the slim driver-checkable witness that both
    * engines selected the IDENTICAL fingerprints, not just the same
    * number). Docs too short for a full window (< k+w−1 tokens) keep a
    * row with n_fp = 0 and a null digest. */
  def winnow(s: SparkSession, dir: String, k: Int = 8,
      w: Int = 4): DataFrame = {
    import s.implicits._
    val per = winnowFrame(s, dir, k, w)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_fp"),
        md5(concat_ws("", array_sort(collect_list($"f")))).as("fp_digest"))
    Tables.documents(s, dir)
      .select($"doc_id",
        greatest(size(toks($"text")) - (k - 1), lit(0)).cast("long")
          .as("n_spans"))
      .join(per, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"n_spans",
        coalesce($"n_fp", lit(0L)).as("n_fp"), $"fp_digest")
      .orderBy($"doc_id")
  }

  /** Fingerprint-overlap near-dup candidates: document pairs sharing ≥
    * minShared winnowing fingerprints, scored by containment (shared /
    * smaller fingerprint set — one exact IEEE division). The join is an
    * inverted-index posting self-join keyed on the fingerprint hash, the
    * same 100 TB shape as ngramJaccardPairs but over the winnowed ~2/(w+1)
    * subset of spans; `maxDf` drops ubiquitous fingerprints (boilerplate
    * that would otherwise quadratically dominate the posting join —
    * measured corpus max df is 3, so the default cap is a no-op here and
    * load-bearing at scale, pinned in the spec like ngram's). */
  def winnowPairs(s: SparkSession, dir: String, k: Int = 8, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    import s.implicits._
    // one frame carries both the df cap and the per-doc set size as
    // window counts, so each posting-join side is a single lineage (a
    // groupBy+join formulation re-derives the window-min frame once per
    // consumer — 3 extra corpus scans for the same answer). n_fp counts
    // the UNCAPPED set: containment stays a property of the documents,
    // not of the cap parameter.
    val fps = winnowFrame(s, dir, k, w)
      .withColumn("n_fp", count(lit(1)).over(Window.partitionBy($"doc_id")))
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"f")))
      .filter($"df" <= maxDf)
      .select($"doc_id", $"f", $"n_fp")
    fps.select($"doc_id".as("a_id"), $"f", $"n_fp".as("a_n_fp"))
      .join(fps.select($"doc_id".as("b_id"), $"f", $"n_fp".as("b_n_fp")), "f")
      .filter($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("n_shared"),
        min($"a_n_fp").as("a_n_fp"), min($"b_n_fp").as("b_n_fp"))
      .filter($"n_shared" >= minShared)
      .select($"a_id", $"b_id", $"n_shared",
        ($"n_shared".cast("double") /
          least($"a_n_fp", $"b_n_fp").cast("double")).as("containment"))
      .orderBy($"a_id", $"b_id")
  }

  /** End-to-end training-data pipeline funnel — the integration query: a
    * Dolma/RefinedWeb-shaped curation pipeline (quality filter → language
    * filter → prefix-fingerprint exact dedup → exact-substring span
    * dedup) composed as ONE plan, reporting per-source survivor counts
    * after every stage. Each stage applies to the previous stage's
    * survivors, which is the part no per-operator query demonstrates:
    * the dedup stages' duplicate universe is the filtered corpus, not
    * the raw one.
    *
    * Stage rules reuse the per-operator queries' semantics with
    * integer-exact arithmetic (0.65 duplicate-token mass as 20·(n−nd) ≤
    * 13·n — no doubles anywhere): quality = length ≥ 20 ∧ repetition
    * bound; language = en; exact tier = first doc per md5 of the head-16
    * -token prefix (identical texts share it, and it is the cheap
    * hash-groupBy tier that runs before any near-dup machinery); span
    * tier = spanDedup's integer drop verdict computed among survivors.
    * One lineage with boolean stage flags → window-min for the exact
    * tier (keyed on the 16-byte prefix hash) → one span explode over
    * survivors only → per-source rollup. All counts are exact integers —
    * oracle-checked end to end. */
  def pipelineFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flagged = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"lang", toks($"text").as("t"))
      .select($"doc_id", $"source", $"lang", $"t",
        size($"t").as("n"), size(array_distinct($"t")).as("nd"))
      .withColumn("q1",
        $"n" >= 20 && lit(20) * ($"n" - $"nd") <= lit(13) * $"n")
      .withColumn("q2", $"q1" && $"lang" === "en")
      .withColumn("pfx", md5(concat_ws(" ", slice($"t", 1, 16))))
    val s3 = flagged
      .withColumn("min_doc",
        min(when($"q2", $"doc_id")).over(Window.partitionBy($"pfx")))
      .withColumn("q3", $"q2" && $"doc_id" === $"min_doc")
    val per = s3.filter($"q3")
      .select($"doc_id", explode(TextOps.shingles($"t", 16)).as("sp"))
      .select($"doc_id", md5($"sp").as("h"))
      .withColumn("c", count(lit(1)).over(Window.partitionBy($"h")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nsp"),
        sum(when($"c" > 1, 1L).otherwise(0L)).as("ndp"))
    s3.join(per, Seq("doc_id"), "left_outer")
      .withColumn("q4", $"q3" &&
        (coalesce($"nsp", lit(0L)) === 0L || $"ndp" * 2 < $"nsp"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"q1".cast("long")).as("n_quality"),
        sum($"q2".cast("long")).as("n_lang"),
        sum($"q3".cast("long")).as("n_exact"),
        sum($"q4".cast("long")).as("n_final"))
      .orderBy($"source")
  }

  /** Winnowing-based corpus dedup end-to-end: fingerprint-overlap pairs
    * (winnowPairs, ≥2 shared) → connected components → keep the min-id
    * representative — the full fingerprint→decision path as ONE query,
    * oracle-checked against a DuckDB recursive-CTE replica (same pattern
    * as q_dedup_clusters, over the winnow pair graph instead of the
    * n-gram one). Every document keeps a row: its duplicate-group label
    * and whether it survives. */
  def winnowDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = winnowPairs(s, dir).select($"a_id", $"b_id")
    val comps = graft.operators.Graph.connectedComponents(pairs)
    Tables.documents(s, dir).select($"doc_id")
      .join(comps.select($"id".as("doc_id"), $"component"),
        Seq("doc_id"), "left_outer")
      .select($"doc_id",
        coalesce($"component", $"doc_id").as("component"),
        when($"component".isNull || $"component" === $"doc_id", 1L)
          .otherwise(0L).as("kept"))
      .orderBy($"doc_id")
  }

  /** PII redaction evidence query: emails/phones/IPv4s are counted and
    * scrubbed to typed placeholder tokens (TextOps.scrubPii — the
    * ROOTS/Dolma pre-training redact step). The corpus text is letters
    * only, so PII-bearing inputs are DERIVED deterministically from
    * doc_id (the same generator-formula pattern as the multimodal
    * evidence queries): docs hit by the 3/4/5 residue classes gain an
    * email/phone/IP, the rest pass through untouched and pin the no-op
    * path. Both the injection and the scrub are pure SQL in the Java ∩
    * RE2 regex dialect, so the DuckDB oracle byte-matches the scrubbed
    * text (compared via md5 so rows stay slim). Map-only — no shuffle at
    * any scale until the presentation sort. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Seq((emailPat, _), (phonePat, _), (ipPat, _)) = TextOps.piiPatterns
    val injected = concat(
      $"text",
      when($"doc_id" % 3 === 0, concat(lit(" mail user"),
        $"doc_id".cast("string"), lit("@example.com ok"))).otherwise(""),
      when($"doc_id" % 4 === 0, concat(lit(" call 555-867-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"))).otherwise(""),
      when($"doc_id" % 5 === 0, concat(lit(" host 10."),
        ($"doc_id" % 256).cast("string"), lit(".0."),
        ($"doc_id" % 200 + 1).cast("string"), lit(" up"))).otherwise(""))
    Tables.documents(s, dir)
      .select($"doc_id", injected.as("txt"))
      .select($"doc_id",
        regexp_count($"txt", lit(emailPat)).cast("long").as("n_email"),
        regexp_count($"txt", lit(phonePat)).cast("long").as("n_phone"),
        regexp_count($"txt", lit(ipPat)).cast("long").as("n_ip"),
        md5(TextOps.scrubPii($"txt")).as("clean_md5"),
        (TextOps.scrubPii($"txt") =!= $"txt").cast("long").as("changed"))
      .orderBy($"doc_id")
  }
}
