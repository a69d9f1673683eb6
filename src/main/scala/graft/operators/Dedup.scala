package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deduplication operators for large text corpora.
  *
  * Three tiers, all pure DataFrame/codegen built-ins (no UDFs, no RDDs):
  *
  *  - exact: hash-groupBy on content (or any key set) — one shuffle.
  *  - MinHash + LSH banding: shingle → k-minhash signature → b bands →
  *    bucket join — the standard near-dup pipeline (Broder minhashing;
  *    banding analysis as in Leskovec/Rajaraman/Ullman, MMDS ch.3). Only
  *    docs sharing a band bucket are compared, so the candidate join is
  *    bucket-local — at 100 TB the bucket id is the shuffle key and no
  *    quadratic blowup occurs (hot buckets are bounded by `maxBucket`).
  *  - SimHash: 64-bit sign-fingerprint; near-dups = small Hamming
  *    distance, blocked on 16-bit sub-bands (Charikar; pigeonhole: any
  *    pair within Hamming ≤ 3 shares at least one of 4 exact sub-bands).
  *
  * Determinism: hashes are xxhash64 seeded by the literal hash index, so
  * signatures are stable across runs/partitionings — no unseeded RNG
  * (fixes the reference's unseeded MinHashLSH, SURVEY.md §2.7 M8).
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeps the row with the lowest
    * tie-break id per key group. One hash shuffle on the key. */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** k seeded minhashes of a token-set column: sig[j] = min over tokens of
    * xxhash64(j, xxhash64(token)). The token string is hashed ONCE and the
    * k per-seed mixes run on longs — vs hashing every string k times.
    * Array column of length k. (HOF form for array-column callers; the
    * near-dup pipeline itself uses the exploded codegen formulation in
    * `minhashNearDup`, which computes the identical signature.) */
  def minhashSignature(tokens: Column, k: Int): Column =
    graft.functions.TextOps.bindOnce(transform(tokens, t => xxhash64(t))) {
      hs =>
        transform(sequence(lit(0), lit(k - 1)),
          j => array_min(transform(hs, h => xxhash64(j, h))))
    }

  /** LSH band keys: signature split into `bands` bands of size k/bands,
    * each hashed to one bucket id. Array of (bandIdx, bucketHash). */
  def bandKeys(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map(b => struct(lit(b).as("band"),
      xxhash64(lit(b), slice(sig, b * rows + 1, rows)).as("bucket"))): _*)
  }

  /** The (band, bucket, id) LSH frame `minhashNearDup` pairs within —
    * exposed as the banding diagnostic: tuning k/bands (and validating
    * `maxBucket`) on a real corpus starts from this frame's bucket-size
    * histogram, because candidate volume is Σ n·(n−1)/2 over bucket
    * sizes n. Input: a (id, sh: array&lt;string&gt;) frame of distinct
    * shingles per doc.
    *
    * Signature via explode + codegen hash-aggregate, NOT per-row
    * higher-order functions: HOF lambdas evaluate interpreted (outside
    * whole-stage codegen), and the k min-passes over a string array
    * measured ~10× the cost of this form, which hashes each shingle
    * string ONCE, mixes k seeded variants on longs, and takes the k mins
    * in one HashAggregate with map-side partial aggregation. Same
    * signature values as `minhashSignature`. At scale the shuffle is
    * slim (id, k longs) rows — postings never leave their map task.
    * explode must be a top-level generator (Spark rejects generators
    * nested in expressions), so project it first, then hash.
    * Bucket = hash of the band's k/bands signature components (same
    * banding scheme as `bandKeys`; bucket ids differ — scalar multi-arg
    * hash vs array hash). */
  def minhashBuckets(shingled: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be a multiple of bands=$bands")
    val spark = shingled.sparkSession
    import spark.implicits._
    val posts = shingled
      .select($"id", explode($"sh").as("s"))
      .select($"id", xxhash64($"s").as("h"))
    val sigCols = (0 until k).map(j => min(xxhash64(lit(j), $"h")).as(s"m$j"))
    val sig = posts.groupBy($"id").agg(sigCols.head, sigCols.tail: _*)
    val rows = k / bands
    val bandStructs = (0 until bands).map { b =>
      val comps = (b * rows until (b + 1) * rows).map(j => col(s"m$j"))
      struct(lit(b).as("band"),
        xxhash64((lit(b) +: comps): _*).as("bucket"))
    }
    sig
      .select($"id", explode(array(bandStructs: _*)).as("bk"))
      .select($"bk.band".as("band"), $"bk.bucket".as("bucket"), $"id")
  }

  /** MinHash/LSH near-duplicate candidate pairs with exact-Jaccard
    * verification.
    *
    * @param df        input
    * @param idCol     unique row id (orderable)
    * @param tokensCol token array to shingle
    * @param shingleN  word-shingle size
    * @param k         minhash functions (signature length)
    * @param bands     LSH bands; candidate recall ~ 1-(1-s^(k/b))^b
    * @param threshold exact-Jaccard cutoff applied to candidates
    * @param maxBucket skip degenerate buckets larger than this (hot-key
    *                  guard: a bucket of size m yields m² pairs)
    * @return (a_id, b_id, jaccard) with a_id < b_id, each pair once
    */
  def minhashNearDup(df: DataFrame, idCol: String, tokensCol: String,
      shingleN: Int = 2, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // No cache: the shingle array is recomputed per consumer (bucket pass
    // + the two verify-join build sides) — three linear passes. (Caching
    // here leaked blocks for the session lifetime: Dataset.cache registers
    // in CacheManager and is never GC-reclaimed; and at 100 TB a
    // corpus-wide shingle cache is infeasible anyway.)
    // Empty-shingle docs are exactly those with < shingleN tokens, so the
    // guard filters on the cheap input column and pushes to the scan.
    val shingled = df
      .filter(size(col(tokensCol)) >= shingleN)
      .select(col(idCol).as("id"),
        array_distinct(TextOps.shingles(col(tokensCol), shingleN)).as("sh"))

    val buckets = minhashBuckets(shingled, k, bands)

    // Bucket-local candidate pairs from ONE pass: hot-bucket guard FIRST
    // (a sort-based window count over the (band, bucket) partitions —
    // spillable, so a degenerate bucket of any size survives the count),
    // THEN collect_list over the surviving rows, pairs generated in-place
    // per bucket. Ordering matters: counting via the collect_list itself
    // (the earlier form) built the full membership array in one
    // non-spillable aggregation buffer BEFORE the size filter could drop
    // it — the guard bounded output, not memory. The window shuffles on
    // the same key as the groupBy, so no extra exchange; the previous
    // self-join-on-bucket shape additionally planned the whole signature
    // pipeline twice (Spark does not share common subplans). After the
    // guard, list and pair expansion are ≤ maxBucket / maxBucket² by
    // construction. Pairs are deduped across bands FIRST (a pair
    // colliding in m bands would otherwise be exact-verified m times).
    val wBucket = Window.partitionBy($"band", $"bucket")
    val cand = buckets
      .withColumn("n", count(lit(1)).over(wBucket))
      .filter($"n".between(2, maxBucket))
      .groupBy($"band", $"bucket")
      .agg(collect_list($"id").as("ids"))
      .filter(size($"ids") >= 2)
      .select(explode(flatten(transform($"ids", x =>
        transform(filter($"ids", y => y > x),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select($"p.a_id".as("a_id"), $"p.b_id".as("b_id"))
      .distinct()
    cand
      .join(shingled.select($"id".as("a_id"), $"sh".as("a_sh")), "a_id")
      .join(shingled.select($"id".as("b_id"), $"sh".as("b_sh")), "b_id")
      .select($"a_id", $"b_id",
        (size(array_intersect($"a_sh", $"b_sh")).cast("double") /
          size(array_union($"a_sh", $"b_sh")).cast("double")).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** Corpus-level near-duplicate REMOVAL — the pipeline payoff the pair
    * operators feed: collapse near-dup pairs into clusters (connected
    * components — pairs are not transitively closed) and keep only each
    * cluster's minimum-id representative. Rows never mentioned in `pairs`
    * survive untouched.
    *
    * @param df    corpus
    * @param pairs near-dup pairs (a_id, b_id) from any pair operator
    *              (minhashNearDup, simhashNearDup, ngramJaccardPairs, …)
    * @param idCol corpus id column matching the pair ids
    */
  def keepRepresentatives(df: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame =
    keepRepresentativesFromComponents(df,
      Graph.connectedComponents(pairs), idCol)

  /** keepRepresentatives over an already-computed (id, component) frame —
    * lets callers reuse one connected-components result across consumers
    * (GraphQueries caches it per session). */
  def keepRepresentativesFromComponents(df: DataFrame, components: DataFrame,
      idCol: String): DataFrame = {
    val losers = components
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__loser"))
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /** keepRepresentatives variant that keeps the BEST cluster member by a
    * caller-supplied score instead of the minimum id — the production
    * dedup decision rule (keep the highest-quality representative, not
    * the first-crawled one). Ties break to the lowest id so the kept set
    * is deterministic. Docs absent from `components` (never paired)
    * survive untouched; docs in `components` but absent from `scores`
    * are treated as unscored and also survive (callers should score the
    * whole corpus).
    *
    * Scale shape: the window runs over `components` (pair-graph nodes
    * only, not the corpus), keyed by the component id; the corpus is
    * touched once by the final anti-join on the doc id.
    *
    * @param scores (id, score) frame, ids matching the component ids
    */
  def keepBestFromComponents(df: DataFrame, components: DataFrame,
      idCol: String, scores: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("component"))
      .orderBy(col("score").desc, col("id").asc)
    val losers = components
      .join(scores, Seq("id"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col("id").as("__loser"))
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /** 64-bit SimHash fingerprint of a token array: bit i of the result is
    * the sign of sum over tokens of (bit i of xxhash64(token) ? +1 : -1).
    * Pure higher-order functions; deterministic. The token-hash array is
    * let-bound so the 64 per-bit passes share ONE hash evaluation (inlined
    * as a plain alias, CollapseProject would re-hash per bit). */
  def simhash(tokens: Column): Column =
    // fused one-pass codegen kernel since r17 (the valued-probe audit
    // measured the HOF form at 11.6 µs/row — 64 interpreted filter
    // passes; the kernel hashes each token once and accumulates all 64
    // bit counters in a single walk). Bit-parity with simhashHof is
    // pinned in DedupSpec, empty/null edge cases included.
    graft.functions.SimHashExpr.simhash64(tokens)

  /** The original 64-pass higher-order-function formulation — kept as
    * the executable parity WITNESS for the fused kernel (DedupSpec pins
    * simhash ≡ simhashHof on real corpora and edge fixtures), not for
    * production use. */
  private[graft] def simhashHof(tokens: Column): Column =
    TextOps.bindOnceScalar(transform(tokens, t => xxhash64(t))) { hashes =>
      val n = size(hashes)
      // per-bit majority vote: bit set iff #set ≥ n/2 (2*set ≥ n)
      (0 until 64).map { i =>
        val setCnt = size(filter(hashes,
          h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L))
        when(setCnt * 2 >= n, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4×16-bit sub-bands (pigeonhole
    * guarantees recall for Hamming ≤ 3), verify exact Hamming.
    *
    * @param maxBucket skip degenerate band buckets larger than this (hot-key
    *                  guard: a bucket of m identical-fingerprint docs yields
    *                  m² pairs — same backstop as `minhashNearDup`)
    */
  def simhashNearDup(df: DataFrame, idCol: String, tokensCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    // exactRecall=false: this operator's pinned contract (and its DuckDB
    // replay oracle) is BANDED-CANDIDATE semantics — callers may pass
    // maxHamming past the 4-band pigeonhole bound (q_simhash_neardup
    // ships maxHamming=6) and get best-effort recall above Hamming 3,
    // exactly what the oracle recomputes.
    hammingNearDupPairs(df, idCol, simhash(col(tokensCol)), maxHamming,
      nBands = 4, maxBucket = maxBucket, exactRecall = false)

  /** Hamming-banded near-dup pairs over ANY 64-bit fingerprint column —
    * the simhashNearDup machinery with the fingerprint factored out so
    * other fingerprint families (image dHash, r17) reuse the identical
    * block-verify plan. Pigeonhole recall: split into `nBands` equal
    * sub-bands; a pair with Hamming ≤ nBands−1 agrees exactly on at
    * least one band, so blocking on band equality has FULL recall for
    * `maxHamming` ≤ nBands−1. Output (a_id, b_id, hamming),
    * exact-verified.
    *
    * @param fp 64-bit fingerprint EXPRESSION — let-bound once into the
    *           band-explode (as a projected alias, CollapseProject would
    *           inline it into the nBands shift exprs + the carried fp
    *           column and recompute it (nBands+1)× per row)
    * @param exactRecall true (default) asserts maxHamming ≤ nBands−1 so
    *           the output is EXACTLY all-pairs-within-radius (what lets
    *           q_image_neardup's oracle be the brute-force join); pass
    *           false to acknowledge banded best-effort semantics above
    *           the bound (the simhash posture — its oracle replays the
    *           banding) */
  def hammingNearDupPairs(df: DataFrame, idCol: String, fp: Column,
      maxHamming: Int, nBands: Int, maxBucket: Int = 1000,
      exactRecall: Boolean = true): DataFrame = {
    require(64 % nBands == 0, s"nBands=$nBands must divide 64")
    require(!exactRecall || maxHamming <= nBands - 1,
      s"pigeonhole-exact recall needs maxHamming=$maxHamming <= " +
        s"nBands-1=${nBands - 1}; pass exactRecall=false to accept " +
        "banded best-effort candidates above the bound")
    val spark = df.sparkSession
    import spark.implicits._
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val banded = df.select(col(idCol).as("id"),
        explode(TextOps.bindOnce(fp) { f =>
          array((0 until nBands).map(b => struct(lit(b).as("band"),
            shiftright(f, b * width).bitwiseAND(lit(mask)).as("key"),
            f.as("fp"))): _*)
        }).as("bk"))
      .select($"bk.band", $"bk.key", $"id", $"bk.fp".as("fp"))
    // Hot-bucket guard FIRST (spillable sort-based window count over the
    // (band, key) partitions), THEN collect_list over the surviving rows
    // with pairs generated in-place per bucket — the same shape as
    // `minhashNearDup`: the window shuffles on the same key as the
    // groupBy (no extra exchange), membership lists are ≤ maxBucket by
    // construction, and the previous self-join-on-bucket form planned the
    // whole fingerprint pipeline twice (Spark shares no common subplans).
    val wBucket = Window.partitionBy($"band", $"key")
    banded
      .withColumn("n", count(lit(1)).over(wBucket))
      .filter($"n".between(2, maxBucket))
      .groupBy($"band", $"key")
      .agg(collect_list(struct($"id", $"fp")).as("ms"))
      .select(explode(flatten(transform($"ms", x =>
        transform(filter($"ms", y => y.getField("id") > x.getField("id")),
          y => struct(x.getField("id").as("a_id"),
            y.getField("id").as("b_id"),
            x.getField("fp").as("a_fp"),
            y.getField("fp").as("b_fp")))))).as("p"))
      .select($"p.a_id".as("a_id"), $"p.b_id".as("b_id"),
        hamming($"p.a_fp", $"p.b_fp").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .groupBy($"a_id", $"b_id").agg(first($"hamming").as("hamming"))
  }
}
