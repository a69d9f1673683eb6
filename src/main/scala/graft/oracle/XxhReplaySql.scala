package graft

/** DuckDB replay SQL for Spark's `xxhash64` — the r14 extension of the
  * r13 hyperplane-replay device (VERDICT r13 #2) to the two remaining
  * hash-seeded near-dup tiers. Spark's XxHash64 expression is standard
  * XXH64 (seed 42) over a value's bytes: UTF8 bytes for strings, the
  * 8-byte two's-complement pattern for longs, 4 bytes for ints, with
  * multi-arg calls chaining `hash_i = XXH64(child_i, hash_{i-1})`. All
  * of that is a pure function of the input bytes, so DuckDB can
  * recompute the ENTIRE minhash/simhash pipeline — token/shingle string
  * hashes, the k seeded signature mins, band bucket ids, the
  * bucket-guarded candidate join, and the exact jaccard/hamming verify —
  * independently from the raw `documents` parquet. This flips
  * q_minhash_neardup and q_simhash_neardup from rows-only to
  * hash-checked.
  *
  * Formulation: one value is one HUGEINT in [0, 2^64); `mod64` wraps,
  * `mul64` splits into 32-bit halves so no intermediate exceeds int128,
  * rotations are divmod by powers of two, and DuckDB's native
  * `xor(HUGEINT, HUGEINT)` covers the xors. Loops (byte extraction,
  * 32-byte stripes, tail words) are `list_reduce` folds seeded through
  * `list_concat([init], ...)`. Everything data-dependent is staged
  * through CTE columns — each stage references the previous stage's
  * COLUMN, so the textual expansion of a nested hash chain stays linear
  * instead of exponential (inlining one fmix multiplies text ~72×). The
  * per-seed mix constants (XXH64 of the band/signature index ints) are
  * evaluated here in Scala and embedded as literals.
  *
  * Validated three ways: XXH64 unit vectors vs Spark's xxhash64 (incl.
  * multi-byte UTF-8, 0/31/32/33/100-byte lengths, the multi-arg chain),
  * and the full pipelines bit-matching the Spark verify dumps at sf0.01
  * (25 minhash pairs, 110 simhash pairs) before landing.
  */
object XxhReplaySql {
  private val M64 = "18446744073709551616"
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** Unsigned-decimal literal of a Long's 64-bit pattern. */
  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  private[graft] def mod64(x: String) = s"(($x) % $M64)"

  /** (a*b) mod 2^64 via 32-bit halves; intermediates < 2^66 fit int128. */
  private[graft] def mul64(a: String, b: String): String = mod64(
    s"(($a) % 4294967296) * (($b) % 4294967296)" +
      s" + (((($a) % 4294967296) * (($b) // 4294967296)" +
      s" + (($a) // 4294967296) * (($b) % 4294967296)) % 4294967296)" +
      s" * 4294967296")

  private[graft] def mul64(a: String, b: Long): String = mul64(a, u(b))

  private def rotl(x: String, r: Int): String = {
    val lo = java.math.BigInteger.ONE.shiftLeft(64 - r)
    s"((($x) % $lo) * ${java.math.BigInteger.ONE.shiftLeft(r)} + ($x) // $lo)"
  }

  private[graft] def xorS(a: String, b: String) = s"xor($a, $b)"

  private[graft] def shr(x: String, r: Int) =
    s"(($x) // ${java.math.BigInteger.ONE.shiftLeft(r)})"

  /** round(0, w) = rotl31(w·P2)·P1 — the XXH64 lane round with acc 0. */
  private def rnd0(w: String): String = mul64(rotl(mul64(w, P2), 31), P1)

  /** The 3-stage XXH64 avalanche, ending in column `{out}_u`. */
  private def fmixStages(out: String, h: String): Seq[(String, String)] = Seq(
    s"${out}_f1" -> mul64(xorS(h, shr(h, 33)), P2),
    s"${out}_f2" -> mul64(xorS(s"${out}_f1", shr(s"${out}_f1", 29)), P3),
    s"${out}_u" -> xorS(s"${out}_f2", shr(s"${out}_f2", 32)))

  /** XXH64.hashInt evaluated here (Scala Long wrap-around ≡ mod 2^64);
    * private[graft] so the spec can pin it against Spark's xxhash64. */
  private[graft] def hashIntConst(i: Int, seed: Long = 42L): Long = {
    var h = seed + P5 + 4
    h ^= (i & 0xFFFFFFFFL) * P1
    h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Unsigned [0,2^64) → signed BIGINT (Spark LongType's value). */
  private[graft] def toSigned(x: String): String =
    s"(CASE WHEN ($x) >= 9223372036854775808 THEN CAST(($x) - $M64 AS BIGINT)" +
      s" ELSE CAST($x AS BIGINT) END)"

  /** Signed BIGINT column → unsigned [0,2^64) HUGEINT. */
  private[graft] def toUnsigned(c: String): String =
    s"(CAST($c AS HUGEINT) + (CASE WHEN $c < 0 THEN $M64 ELSE 0 END))"

  /** 8-byte little-endian word of byte-list `bs` at 0-based offset expr. */
  private def word8(bs: String, off: String): String =
    (0 until 8).map(j =>
      s"($bs[($off) + ${j + 1}]::HUGEINT) * ${java.math.BigInteger.ONE.shiftLeft(8 * j)}")
      .mkString("(", " + ", ")")

  /** The UTF8-byte extraction prologue shared by every string replay:
    * `{out}_hx` (hex), `{out}_bl` (byte length), `{out}_bs` (1-indexed
    * HUGEINT byte list). */
  private[graft] def byteStages(strCol: String,
      out: String): Seq[(String, String)] = Seq(
    s"${out}_hx" -> s"hex(encode($strCol))",
    s"${out}_bl" -> s"octet_length(encode($strCol))",
    s"${out}_bs" ->
      (s"list_transform(generate_series(1, ${out}_bl), i -> " +
        s"CAST((strpos('0123456789ABCDEF', substr(${out}_hx, 2*i-1, 1)) - 1) * 16" +
        s" + strpos('0123456789ABCDEF', substr(${out}_hx, 2*i, 1)) - 1 AS HUGEINT))"))

  /** Stage list computing XXH64(utf8($strCol), seed) into `{out}_u`:
    * hex-decode the UTF8 bytes, 4-lane 32-byte stripes, 8/4/1-byte
    * tails, avalanche — the full variable-length algorithm. */
  private[graft] def strHashStages(strCol: String, out: String,
      seed: Long = 42L): Seq[(String, String)] = {
    val st = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    st ++= byteStages(strCol, out)
    st += s"${out}_ns" -> s"(${out}_bl // 32)"
    val inits = Seq(seed + P1 + P2, seed + P2, seed, seed - P1)
    for (lane <- 0 until 4) {
      val w = word8(s"${out}_bs", s"32*t + ${8 * lane}")
      val step = mul64(rotl(mod64(s"a + ${mul64("w", P2)}"), 31), P1)
      st += s"${out}_v${lane + 1}" ->
        (s"list_reduce(list_concat([CAST(${u(inits(lane))} AS HUGEINT)], " +
          s"list_transform(generate_series(0, ${out}_ns - 1), t -> $w)), " +
          s"(a, w) -> $step)")
    }
    st += s"${out}_m0" -> mod64(
      s"${rotl(s"${out}_v1", 1)} + ${rotl(s"${out}_v2", 7)}" +
        s" + ${rotl(s"${out}_v3", 12)} + ${rotl(s"${out}_v4", 18)}")
    var prev = s"${out}_m0"
    for (lane <- 0 until 4) {
      val c = s"${out}_m${lane + 1}"
      st += c -> mod64(s"${mul64(xorS(prev, rnd0(s"${out}_v${lane + 1}")), P1)} + ${u(P4)}")
      prev = c
    }
    st += s"${out}_h1" -> mod64(
      s"(CASE WHEN ${out}_bl >= 32 THEN ${out}_m4" +
        s" ELSE CAST(${u(seed + P5)} AS HUGEINT) END) + ${out}_bl")
    st += s"${out}_n8" -> s"((${out}_bl - ${out}_ns * 32) // 8)"
    val w8 = word8(s"${out}_bs", s"${out}_ns * 32 + 8*t")
    val step8 = mod64(s"${mul64(rotl(xorS("a", rnd0("w")), 27), P1)} + ${u(P4)}")
    st += s"${out}_h2" ->
      (s"list_reduce(list_concat([${out}_h1], " +
        s"list_transform(generate_series(0, ${out}_n8 - 1), t -> $w8)), " +
        s"(a, w) -> $step8)")
    st += s"${out}_o4" -> s"(${out}_ns * 32 + ${out}_n8 * 8)"
    val w4 = (0 until 4).map(j =>
      s"(${out}_bs[${out}_o4 + ${j + 1}]::HUGEINT) * ${1L << (8 * j)}")
      .mkString("(", " + ", ")")
    st += s"${out}_h3" ->
      (s"(CASE WHEN ${out}_o4 + 4 <= ${out}_bl THEN " +
        mod64(s"${mul64(rotl(xorS(s"${out}_h2", mul64(w4, P1)), 23), P2)} + ${u(P3)}") +
        s" ELSE ${out}_h2 END)")
    st += s"${out}_ob" ->
      s"(${out}_o4 + (CASE WHEN ${out}_o4 + 4 <= ${out}_bl THEN 4 ELSE 0 END))"
    val stepB = mul64(rotl(xorS("a", mod64(s"w * ${u(P5)}")), 11), P1)
    st += s"${out}_h4" ->
      (s"list_reduce(list_concat([${out}_h3], " +
        s"list_transform(generate_series(${out}_ob + 1, ${out}_bl), i -> ${out}_bs[i])), " +
        s"(a, w) -> $stepB)")
    st ++= fmixStages(out, s"${out}_h4")
    st.toSeq
  }

  /** XXH64.hashLong evaluated in Scala, the long twin of hashIntConst;
    * private[graft] so the spec can pin it against Spark's xxhash64. */
  private[graft] def hashLongConst(v: Long, seed: Long = 42L): Long = {
    var h = seed + P5 + 8
    h ^= java.lang.Long.rotateLeft(v * P2, 31) * P1
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Stage list computing XXH64 of a signed BIGINT column's 8-byte
    * pattern (Spark's `xxhash64` on a LongType child) into `{out}_u`:
    * one 8-byte block round + avalanche, the hashLong fast path. */
  private[graft] def longHashStages(col: String, out: String,
      seed: Long = 42L): Seq[(String, String)] = Seq(
    s"${out}_k" -> mul64(rotl(mul64(toUnsigned(col), P2), 31), P1),
    s"${out}_p" -> mod64(
      s"${mul64(rotl(xorS(u(seed + P5 + 8), s"${out}_k"), 27), P1)} + ${u(P4)}")
  ) ++ fmixStages(out, s"${out}_p")

  /** q_priority_sample replay — Extended.prioritySample's pinned shape
    * (weight = n_chars, k = 5 per lang, seed-42 xxhash64 of doc_id):
    * u = h·2⁻⁶⁵ + 0.5 maps the signed hash into [0.25, 0.75) with an
    * exactly-representable scale, priority = w/u is one long→double
    * conversion and one IEEE division — every step correctly rounded
    * and engine-identical, so the doubles (and hence the rank) match
    * bit-for-bit. */
  lazy val prioritySampleSql: String = {
    val scale = math.pow(2, -65).toString
    val layers = longHashStages("doc_id", "dh").map(Seq(_)) :+
      Seq("priority" -> ("CAST(n_chars AS DOUBLE) / " +
        s"(CAST(${toSigned("dh_u")} AS DOUBLE) * $scale + 0.5)"))
    val (ctes, last) = layeredCte(
      "SELECT lang, doc_id, n_chars FROM documents", layers, "p0")
    s"""WITH $ctes
       |SELECT lang, doc_id, n_chars, priority, rk FROM (
       |  SELECT lang, doc_id, n_chars, priority,
       |    CAST(row_number() OVER (
       |      PARTITION BY lang ORDER BY priority DESC, doc_id ASC) AS INT) AS rk
       |  FROM $last)
       |WHERE rk <= 5
       |ORDER BY lang, rk""".stripMargin
  }

  /** q_stratified_sample replay — Extended.stratifiedSample's pinned
    * shape: u53 = xxhash64(l_orderkey·16 + l_linenumber) >>> 11, keep iff
    * u53 < the stratum's exact integer threshold 2^53·num/den
    * (Extended.stratTiers — the thresholds here are evaluated through
    * Extended.stratThreshold, so query and oracle cannot drift). The
    * acceptance test is pure integer compare on a replayed hash — no
    * float anywhere before the final decimal-routed sum. */
  lazy val stratifiedSampleSql: String = {
    val tiers = graft.queries.Extended.stratTiers
    val thrCase = tiers.map { case (f, num, den) =>
      s"WHEN '$f' THEN ${graft.queries.Extended.stratThreshold(num, den)}"
    }.mkString(" ")
    val layers = longHashStages("ck", "sh").map(Seq(_)) :+
      Seq("u53" -> "(sh_u // 2048)")
    val (ctes, last) = layeredCte(
      "SELECT l_returnflag, l_quantity, l_orderkey * 16 + l_linenumber AS ck" +
        " FROM lineitem", layers, "st0")
    s"""WITH $ctes
       |SELECT l_returnflag, count(*) AS n_sampled,
       |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       |FROM $last
       |WHERE u53 < (CASE l_returnflag $thrCase ELSE 0 END)
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  }

  /** Chain layers of independent columns into a CTE pipeline; returns
    * (cteText, lastName). Every stage is AS MATERIALIZED: DuckDB's
    * optimizer inlines single-reference CTEs and substitutes each
    * referenced COLUMN by its defining expression — through a chain of
    * stages that each reference the prior column several times (rotl ×2,
    * mul64 ×3 per operand) the substituted tree grows EXPONENTIALLY, and
    * a replay that evaluates in seconds materialized runs for minutes
    * inlined (measured: q_stratified_sample's 60k-row hashLong replay
    * 2.2 s materialized vs >300 s inlined). Materialization pins the
    * evaluation to once-per-stage-per-row — the semantics are identical,
    * only the plan changes. */
  private[graft] def layeredCte(base: String, layers: Seq[Seq[(String, String)]],
      first: String): (String, String) = {
    val sb = new StringBuilder(s"$first AS MATERIALIZED ($base)")
    var prev = first
    layers.zipWithIndex.foreach { case (layer, i) =>
      val name = s"${first}_${i + 1}"
      val cols = layer.map { case (c, e) => s"$e AS $c" }.mkString(", ")
      sb.append(s",\n$name AS MATERIALIZED (SELECT *, $cols FROM $prev)")
      prev = name
    }
    (sb.toString, prev)
  }

  /** q_minhash_neardup replay — Dedup.minhashNearDup's pinned parameters
    * (shingleN=2, k=32, bands=8, threshold=0.5, maxBucket=1000) over
    * `documents`: per-shingle string hash once on the distinct-shingle
    * vocabulary, 32 seeded long-mixes, per-doc signed mins, per-band
    * 4-long hash chains (Spark's multi-arg xxhash64 seeding), the
    * windowed bucket-size guard, distinct candidate pairs, and the exact
    * distinct-shingle-set jaccard at the 0.5 cutoff. */
  lazy val minhashNearDupSql: String =
    s"""WITH $minhashCandJacCtes
       |SELECT a_id, b_id, jaccard FROM mj
       |WHERE jaccard >= 0.5
       |ORDER BY a_id, b_id""".stripMargin

  /** q_retrieval_eval replay — per query doc (doc_id < 20): recall@10,
    * MRR, nDCG@10 of the minhash candidate tier (mj at threshold 0,
    * reranked by exact jaccard) against the top-10 exact-jaccard gold.
    * Float discipline (the LrReplaySql literal device): the ten
    * 1/log₂(rank+1) discounts and their cumulative sums are embedded as
    * the SAME shortest-repr doubles Extended.NdcgDiscounts holds, DCG is
    * a left-assoc literal chain over integer 0/1 per-rank flags, MRR one
    * division by an integer rank — no float aggregate whose order an
    * engine could choose. */
  lazy val retrievalEvalSql: String = {
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('E') || s.contains('e')) s else s + "e0"
    }
    val disc = graft.queries.Extended.NdcgDiscounts
    val cum = graft.queries.Extended.NdcgIdcgCum
    val rCols = (1 to 10).map(i =>
      s"MAX(CASE WHEN rnk = $i THEN rel ELSE 0 END) AS r$i").mkString(", ")
    val dcg = (1 to 10).map(i =>
      s"(CAST(COALESCE(s.r$i, 0) AS DOUBLE) * ${dlit(disc(i - 1))})")
      .reduceLeft((a, b) => s"($a + $b)")
    val idcg = (1 to 10).map(i =>
      s"WHEN $i THEN ${dlit(cum(i - 1))}").mkString(" ")
    s"""WITH $minhashCandJacCtes,
       |gold_all AS (
       |  SELECT qa.doc_id AS q_id, sb.doc_id AS id,
       |    CAST(len(list_intersect(qa.sh_set, sb.sh_set)) AS DOUBLE) /
       |    CAST(len(qa.sh_set) + len(sb.sh_set)
       |         - len(list_intersect(qa.sh_set, sb.sh_set)) AS DOUBLE)
       |      AS jaccard
       |  FROM shd qa JOIN shd sb ON sb.doc_id <> qa.doc_id
       |  WHERE qa.doc_id < 20
       |), gold10 AS (
       |  SELECT q_id, id FROM (
       |    SELECT q_id, id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY jaccard DESC, id ASC) AS grank
       |    FROM gold_all WHERE jaccard > 0e0) WHERE grank <= 10
       |), gold_agg AS (
       |  SELECT q_id, COUNT(*) AS n_gold FROM gold10 GROUP BY q_id
       |), sys_pairs AS (
       |  SELECT a_id AS q_id, b_id AS id, jaccard FROM mj WHERE a_id < 20
       |  UNION ALL
       |  SELECT b_id AS q_id, a_id AS id, jaccard FROM mj WHERE b_id < 20
       |), sys10 AS (
       |  SELECT q_id, id, rnk FROM (
       |    SELECT q_id, id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY jaccard DESC, id ASC) AS rnk
       |    FROM sys_pairs) WHERE rnk <= 10
       |), sys_rel AS (
       |  SELECT s.q_id, s.rnk,
       |    CASE WHEN g.id IS NULL THEN 0 ELSE 1 END AS rel
       |  FROM sys10 s LEFT JOIN gold10 g ON g.q_id = s.q_id AND g.id = s.id
       |), sys_agg AS (
       |  SELECT q_id, $rCols,
       |    CAST(SUM(rel) AS BIGINT) AS n_hits,
       |    MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel
       |  FROM sys_rel GROUP BY q_id
       |)
       |SELECT g.q_id, g.n_gold,
       |  COALESCE(s.n_hits, 0) AS n_hits,
       |  CAST(COALESCE(s.n_hits, 0) AS DOUBLE) / CAST(g.n_gold AS DOUBLE)
       |    AS recall_at_10,
       |  COALESCE(CAST(1.0 AS DOUBLE) / CAST(s.first_rel AS DOUBLE), 0e0)
       |    AS mrr,
       |  ($dcg) / (CASE g.n_gold $idcg END) AS ndcg_at_10
       |FROM gold_agg g LEFT JOIN sys_agg s USING (q_id)
       |ORDER BY q_id""".stripMargin
  }

  /** The minhash banding pipeline through exact-jaccard verification as
    * a CTE chain ending in `mj(a_id, b_id, jaccard)` — every bucket
    * candidate pair surviving the maxBucket guard, WITH its exact
    * distinct-shingle jaccard, threshold NOT yet applied. Shared by
    * q_minhash_neardup (threshold 0.5 near-dup) and the
    * q_linkpred_ann_e2e replay (threshold 0.0 candidate tier whose 0.5
    * cut becomes the LABEL) so the two oracles can never drift. */
  lazy val minhashCandJacCtes: String = {
    val k = 32; val bands = 8; val rows = 4
    val maxBucket = 1000
    val p58 = P5 + 8
    val vocBase =
      "SELECT DISTINCT shingle FROM (SELECT unnest(sh_set) AS shingle FROM shd)"
    val layers = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    layers ++= strHashStages("shingle", "sh").map(Seq(_))
    // K(h) = rotl31(h·P2)·P1 — the only h-dependent part of hashLong
    layers += Seq("ku" -> mul64(rotl(mul64("sh_u", P2), 31), P1))
    // 32 j-mixes m_j = XXH64(j, h): seed chain constant evaluated here
    val cjs = (0 until k).map(j => u(hashIntConst(j) + p58))
    layers += (0 until k).map(j =>
      s"b$j" -> mod64(s"${mul64(rotl(xorS(cjs(j), "ku"), 27), P1)} + ${u(P4)}"))
    layers += (0 until k).map(j =>
      s"b${j}_f1" -> mul64(xorS(s"b$j", shr(s"b$j", 33)), P2))
    layers += (0 until k).map(j =>
      s"b${j}_f2" -> mul64(xorS(s"b${j}_f1", shr(s"b${j}_f1", 29)), P3))
    layers += (0 until k).map(j =>
      s"m$j" -> toSigned(xorS(s"b${j}_f2", shr(s"b${j}_f2", 32))))
    val (vocCtes, vocLast) = layeredCte(vocBase, layers.toSeq, "v0")

    val sigBase =
      s"SELECT d.doc_id, ${(0 until k).map(j => s"min(v.m$j) AS s$j").mkString(", ")}" +
        s" FROM sh d JOIN $vocLast v USING (shingle) GROUP BY d.doc_id"
    val sl = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    sl += (0 until k).map(j => s"u$j" -> toUnsigned(s"s$j"))
    sl += (0 until k).map(j => s"k$j" -> mul64(rotl(mul64(s"u$j", P2), 31), P1))
    // per-band bucket = XXH64(band, m_{4b}, …, m_{4b+3}): 4 chained
    // hashLong steps, each staged through its avalanche
    for (s <- 0 until rows) {
      layersOfStep(s, bands, rows, p58).foreach(sl += _)
    }
    val (sigCtes, sigLast) = layeredCte(sigBase, sl.toSeq, "g0")

    val bandUnion = (0 until bands).map(b =>
      s"SELECT doc_id, $b AS band, a${b}_${rows - 1}_u AS bucket FROM $sigLast")
      .mkString("\n  UNION ALL\n  ")
    val jac = "CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS DOUBLE)" +
      " / CAST(len(sa.sh_set) + len(sb.sh_set)" +
      " - len(list_intersect(sa.sh_set, sb.sh_set)) AS DOUBLE)"

    s"""shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(string_split(text,' '))-1),
       |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh_set
       |  FROM documents WHERE len(string_split(text,' ')) >= 2
       |), sh AS (
       |  SELECT doc_id, unnest(sh_set) AS shingle FROM shd
       |),
       |$vocCtes,
       |$sigCtes,
       |bk AS (
       |  $bandUnion
       |), kept AS (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bucket) AS n FROM bk)
       |  WHERE n BETWEEN 2 AND $maxBucket
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM kept a JOIN kept b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id
       |), mj AS (
       |  SELECT cand.a_id, cand.b_id, $jac AS jaccard
       |  FROM cand JOIN shd sa ON sa.doc_id = cand.a_id
       |            JOIN shd sb ON sb.doc_id = cand.b_id
       |)""".stripMargin
  }

  /** One band-chain step for every band: hashLong(m_{band·rows+s}, acc),
    * with acc the previous step's avalanched column (or the Scala-side
    * XXH64(band) constant at s=0), staged as pre + 3 avalanche layers. */
  private def layersOfStep(s: Int, bands: Int, rows: Int,
      p58: Long): Seq[Seq[(String, String)]] = {
    val pres = (0 until bands).map { b =>
      val j = b * rows + s
      val seed = if (s == 0) u(hashIntConst(b) + p58)
        else mod64(s"a${b}_${s - 1}_u + ${u(p58)}")
      s"a${b}_${s}_p" -> mod64(s"${mul64(rotl(xorS(seed, s"k$j"), 27), P1)} + ${u(P4)}")
    }
    val f1 = (0 until bands).map(b =>
      s"a${b}_${s}_f1" -> mul64(xorS(s"a${b}_${s}_p", shr(s"a${b}_${s}_p", 33)), P2))
    val f2 = (0 until bands).map(b =>
      s"a${b}_${s}_f2" -> mul64(xorS(s"a${b}_${s}_f1", shr(s"a${b}_${s}_f1", 29)), P3))
    val f3 = (0 until bands).map(b =>
      s"a${b}_${s}_u" -> xorS(s"a${b}_${s}_f2", shr(s"a${b}_${s}_f2", 32)))
    Seq(pres, f1, f2, f3)
  }

  /** q_simhash_neardup replay — Dedup.simhashNearDup's pinned parameters
    * (maxHamming=6, maxBucket=1000): per-token XXH64 on the distinct
    * token vocabulary, the 64-bit per-bit majority-vote fingerprint over
    * tokens WITH multiplicity, 4×16-bit band keys, the windowed bucket
    * guard, distinct candidate pairs, exact hamming ≤ 6. */
  lazy val simhashNearDupSql: String = {
    val maxBucket = 1000; val maxHamming = 6
    val vocBase = "SELECT DISTINCT token FROM (" +
      "SELECT unnest(string_split(text, ' ')) AS token FROM documents)"
    val layers = strHashStages("token", "th").map(Seq(_))
    val (vocCtes, vocLast) = layeredCte(vocBase, layers, "v0")
    val bitSums = (0 until 64).map(i =>
      s"sum(p.cnt * ((v.th_u // ${java.math.BigInteger.ONE.shiftLeft(i)}) % 2)) AS c$i")
      .mkString(", ")
    val fpTerms = (0 until 64).map(i =>
      s"(CASE WHEN 2*c$i >= n THEN ${java.math.BigInteger.ONE.shiftLeft(i)}::HUGEINT" +
        " ELSE 0::HUGEINT END)").mkString(" + ")
    val bandUnion = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, (fp_u // ${java.math.BigInteger.ONE.shiftLeft(16 * b)})" +
        s" % 65536 AS key, fp FROM fpu").mkString("\n  UNION ALL\n  ")

    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), posts AS (
       |  SELECT doc_id, token, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(t) AS token FROM toks)
       |  GROUP BY doc_id, token
       |),
       |$vocCtes,
       |cnts AS (
       |  SELECT p.doc_id, $bitSums
       |  FROM posts p JOIN $vocLast v USING (token)
       |  GROUP BY p.doc_id
       |), fps AS (
       |  SELECT c.doc_id, ${toSigned(s"($fpTerms)")} AS fp
       |  FROM cnts c JOIN (SELECT doc_id, len(t) AS n FROM toks) z USING (doc_id)
       |), fpu AS (
       |  SELECT doc_id, ${toUnsigned("fp")} AS fp_u, fp FROM fps
       |), bk AS (
       |  $bandUnion
       |), kept AS (
       |  SELECT doc_id, band, key, fp FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, key) AS n FROM bk)
       |  WHERE n BETWEEN 2 AND $maxBucket
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.fp AS a_fp, b.fp AS b_fp
       |  FROM kept a JOIN kept b ON a.band = b.band AND a.key = b.key
       |    AND a.doc_id < b.doc_id
       |)
       |SELECT a_id, b_id, CAST(bit_count(xor(a_fp, b_fp)) AS INT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(a_fp, b_fp)) <= $maxHamming
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** q_linkpred_ann_e2e replay (r15) — Extended.linkpredAnnE2e's full
    * candidate-production path re-derived from `documents`, with the
    * session's fitted LR coefficients embedded (the LrReplaySql
    * coefficient-embed device; training stays Spark-side and
    * spec-gated):
    *
    *  - candidates: the shared minhash banding pipeline
    *    (minhashCandJacCtes — the q_minhash_neardup replay verbatim) at
    *    threshold 0; the 0.5 jaccard cut becomes the LABEL;
    *  - easy negatives: partner = pmod(xxhash64(doc_id, j,
    *    'linkpred-neg'), max_id+1) for j ∈ {1,2} — the 3-element hash
    *    chain replayed as hashLong(doc_id, 42) → hashInt(j, ·) →
    *    hashUtf8('linkpred-neg', ·) (the 12-byte constant string
    *    collapses to one 8-byte and one 4-byte tail step whose words
    *    are Scala-side constants), then the least/greatest + distinct +
    *    membership semi-join + candidate anti-join;
    *  - features exactly as the query computes them (token-set
    *    intersect/jaccard on distinct token sets — the q_linkpred_pairs
    *    string-set device, ≡ the hashed-set counts modulo intra-doc
    *    xxh64 collisions at P ≈ 1e-16/doc —, lang equality, |Δchars|);
    *  - the md5-salted holdout quarter and the assembler's NaN guard;
    *  - prediction at the default threshold ≡ margin > 0 (libm-free).
    */
  def linkpredAnnE2eSql(coefficients: Array[Double],
      intercept: Double): String = {
    require(coefficients.length == 4, coefficients.mkString(","))
    val layers = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    // h1 = XXH64.hashLong(doc_id, seed 42)
    layers ++= longHashStages("doc_id", "h1").map(Seq(_))
    // h2 = XXH64.hashInt(j, seed h1): j is the {1,2} partner index col
    layers += Seq("i_a" -> mod64(s"(h1_u + ${u(P5 + 4)})"))
    layers += Seq("i_b" -> xorS("i_a", mul64("CAST(j AS HUGEINT)", P1)))
    layers += Seq("i_c" -> mod64(s"${mul64(rotl("i_b", 23), P2)} + ${u(P3)}"))
    layers ++= fmixStages("h2", "i_c").map(Seq(_))
    // h3 = XXH64.hashUtf8("linkpred-neg", seed h2): 12 bytes = one
    // 8-byte step (word "linkpred") + one 4-byte step (word "-neg"),
    // both little-endian constants evaluated here
    val bytes = "linkpred-neg".getBytes("UTF-8")
    require(bytes.length == 12)
    val w8 = (0 until 8).map(i => (bytes(i) & 0xFFL) << (8 * i)).reduce(_ | _)
    val w4 = (0 until 4).map(i => (bytes(8 + i) & 0xFFL) << (8 * i)).reduce(_ | _)
    val rnd0w8 = java.lang.Long.rotateLeft(w8 * P2, 31) * P1
    layers += Seq("s_a" -> mod64(s"(h2_u + ${u(P5 + 12)})"))
    layers += Seq("s_b" -> mod64(
      s"${mul64(rotl(xorS("s_a", u(rnd0w8)), 27), P1)} + ${u(P4)}"))
    layers += Seq("s_c" -> mod64(
      s"${mul64(rotl(xorS("s_b", u(w4 * P1)), 23), P2)} + ${u(P3)}"))
    layers ++= fmixStages("h3", "s_c").map(Seq(_))
    val negBase =
      "SELECT doc_id, j FROM documents CROSS JOIN (VALUES (1), (2)) jj(j)"
    val (negCtes, negLast) = layeredCte(negBase, layers.toSeq, "ng0")

    val margin = LrReplaySql.marginSql(
      Seq("x1", "x2", "x3", "x4"), coefficients, intercept)
    s"""WITH $minhashCandJacCtes,
       |$negCtes,
       |maxid AS (SELECT max(doc_id) AS mx FROM documents),
       |negp AS (
       |  SELECT doc_id,
       |    ((${toSigned("h3_u")} % (mx + 1)) + (mx + 1)) % (mx + 1) AS partner
       |  FROM $negLast CROSS JOIN maxid
       |), negpair AS (
       |  SELECT DISTINCT least(doc_id, partner) AS a_id,
       |    greatest(doc_id, partner) AS b_id
       |  FROM negp WHERE doc_id <> partner
       |), negk AS (
       |  SELECT n.a_id, n.b_id FROM negpair n
       |  WHERE EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = n.b_id)
       |    AND NOT EXISTS (SELECT 1 FROM mj c
       |                    WHERE c.a_id = n.a_id AND c.b_id = n.b_id)
       |), pairs AS (
       |  SELECT a_id, b_id,
       |    CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END AS label FROM mj
       |  UNION ALL
       |  SELECT a_id, b_id, 0 AS label FROM negk
       |), dt AS (
       |  SELECT doc_id, lang, n_chars,
       |    list_distinct(string_split(text, ' ')) AS tset
       |  FROM documents
       |), feat AS (
       |  SELECT p.a_id, p.b_id, p.label,
       |    CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE) AS x1,
       |    CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE) /
       |      CAST(len(a.tset) + len(b.tset)
       |           - len(list_intersect(a.tset, b.tset)) AS DOUBLE) AS x2,
       |    CASE WHEN a.lang = b.lang THEN 1e0 ELSE 0e0 END AS x3,
       |    CAST(abs(a.n_chars - b.n_chars) AS DOUBLE) AS x4
       |  FROM pairs p JOIN dt a ON a.doc_id = p.a_id
       |               JOIN dt b ON b.doc_id = p.b_id
       |), hold AS (
       |  SELECT * FROM feat
       |  WHERE substr(md5('lpann:' || CAST(a_id AS VARCHAR) || ':'
       |          || CAST(b_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')
       |    AND NOT isnan(x2)
       |)
       |SELECT CAST(label AS BIGINT) AS label,
       |  CAST(CASE WHEN $margin > 0e0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       |  count(*) AS n
       |FROM hold
       |GROUP BY 1, 2
       |ORDER BY label, pred""".stripMargin
  }
}

/** DuckDB replay SQL for the splitmix64-seeded sketch aggregates
  * (functions/SketchAggs.scala) — the r14 follow-on to the xxhash64
  * replay above, flipping q_cm_words and q_bottomk_sample from rows-only
  * to hash-checked. Both sketches are pure functions of the row multiset
  * (Count-Min counters are exact sums; bottom-k is a rank over a seeded
  * hash of the value set), so DuckDB can rebuild them from the raw
  * tables: the splitmix64 mixer is three mul-xor-shift stages in the
  * same HUGEINT mod-2^64 formulation, and the per-byte chain hash is a
  * list_reduce fold over the UTF8 byte list. The probe items' buckets
  * and the bottom-k seed mix are constants of the QUERY (not the data),
  * evaluated through the very SketchAggs.mix/chainHash implementation
  * the aggregates run — the Ann.hyperplane embedding precedent, with
  * zero copy-drift risk.
  *
  * Both SQLs were validated against the Spark verify dumps at sf0.01
  * before landing (18 cm rows, 3 bottom-k groups, bit-exact). */
object SplitmixReplaySql {
  import XxhReplaySql.{mod64, mul64, xorS, shr, toSigned, toUnsigned,
    byteStages, strHashStages, layeredCte}
  import graft.functions.SketchAggs

  /** splitmix64 over an unsigned-HUGEINT expression (SketchAggs.mix). */
  private def mixSql(z: String): String = {
    val s1 = mod64(s"($z) + 11400714819323198485")
    val s2 = mul64(xorS(s1, shr(s1, 30)), 0xbf58476d1ce4e5b9L)
    val s3 = mul64(xorS(s2, shr(s2, 27)), 0x94d049bb133111ebL)
    xorS(s3, shr(s3, 31))
  }

  /** Stages computing SketchAggs.chainHash(strCol, seed) into {out}_u. */
  private def chainHashStages(strCol: String, out: String,
      seed: Long): Seq[(String, String)] =
    byteStages(strCol, out) :+ (s"${out}_u" ->
      (s"list_reduce(list_concat([CAST($seed AS HUGEINT)], ${out}_bs), " +
        s"(a, b) -> ${mixSql(xorS("a", "b"))})"))

  /** q_cm_words replay — TextAnalysis.cmWords' pinned shape (probe set,
    * widthLog2 = 10, depth = 4, seed = 42): DuckDB chain-hashes the
    * distinct token vocabulary, derives the 4 per-depth buckets, builds
    * the per-(lang, depth, bucket) counters from the FULL token stream
    * (multiplicity included — the Count-Min merge is an exact sum, so
    * the counters are partition-order-free by construction), and takes
    * each probe's min counter. Probe buckets are query constants
    * evaluated via SketchAggs.chainHash/mix. */
  lazy val cmWordsSql: String = {
    val probes = Seq("the", "table", "data", "spark", "query", "zzz_absent")
    val depth = 4; val mask = (1 << 10) - 1
    val (ctes, last) = layeredCte("SELECT DISTINCT w FROM posts",
      chainHashStages("w", "bh", 42L).map(Seq(_)), "v0")
    val arms = (0 until depth).map(d =>
      s"SELECT w, $d AS d, (${mixSql(mod64(s"bh_u + $d"))}) % 1024 AS bucket " +
        s"FROM $last").mkString("\n  UNION ALL\n  ")
    val probeRows = (for (it <- probes; d <- 0 until depth) yield {
      val b = SketchAggs.mix(SketchAggs.chainHash(it, 42L) + d) & mask
      s"('$it', $d, $b)"
    }).mkString(",\n    ")
    s"""WITH posts AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
       |),
       |$ctes,
       |vb AS (
       |  $arms
       |), cnt AS (
       |  SELECT p.lang, b.d, b.bucket, count(*) AS c
       |  FROM posts p JOIN vb b USING (w)
       |  GROUP BY 1, 2, 3
       |), pb(item, d, bucket) AS (
       |  VALUES $probeRows
       |), langs AS (
       |  SELECT DISTINCT lang FROM documents
       |), est AS (
       |  SELECT l.lang, p.item, min(coalesce(c.c, 0)) AS est
       |  FROM langs l CROSS JOIN pb p
       |  LEFT JOIN cnt c ON c.lang = l.lang AND c.d = p.d AND c.bucket = p.bucket
       |  GROUP BY 1, 2
       |), exact AS (
       |  SELECT lang, w AS item, count(*) AS tc FROM posts
       |  WHERE w IN (${probes.map(p => s"'$p'").mkString(", ")})
       |  GROUP BY 1, 2
       |)
       |SELECT e.lang, e.item, e.est,
       |  coalesce(x.tc, 0) AS true_count,
       |  e.est - coalesce(x.tc, 0) AS overcount
       |FROM est e LEFT JOIN exact x ON x.lang = e.lang AND x.item = e.item
       |ORDER BY e.lang, e.item""".stripMargin
  }

  /** q_bottomk_sample replay — Extended.bottomkSample's pinned shape
    * (k = 5, seed = 42 over lineitem's l_orderkey per l_returnflag):
    * h = mix(v ⊕ mix(seed)) ranked ascending as SIGNED longs (the
    * aggregate's TreeMap ordering) over the DISTINCT value set, k
    * smallest kept, values emitted ascending. The 2⁻⁶⁴-probability hash
    * collision between distinct values (where the aggregate keeps the
    * first ARRIVAL) is the one non-replayable branch — it would fail
    * the gate loudly, the documented sketch-determinism argument. */
  lazy val bottomkSampleSql: String = {
    val mixSeed = java.lang.Long.toUnsignedString(SketchAggs.mix(42L))
    val h = mixSql(xorS("CAST(v AS HUGEINT)", mixSeed))
    s"""WITH dv AS (
       |  SELECT DISTINCT l_returnflag, l_orderkey AS v FROM lineitem
       |), h AS (
       |  SELECT l_returnflag, v, ${toSigned(h)} AS hs FROM dv
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY hs ASC) AS rn
       |  FROM h
       |), s AS (
       |  SELECT l_returnflag, array_to_string(list(v ORDER BY v), ',') AS sample_keys
       |  FROM r WHERE rn <= 5 GROUP BY 1
       |), n AS (
       |  SELECT l_returnflag, count(*) AS n_rows FROM lineitem GROUP BY 1
       |)
       |SELECT s.l_returnflag, s.sample_keys, n.n_rows
       |FROM s JOIN n USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** q_sketch_overlap replay — Extended.sketchOverlap's pinned shape
    * (k = 256, seed 42 over documents' space-split tokens per source):
    * DuckDB re-derives the ENTIRE pipeline from raw text — XXH64 token
    * hashes (strHashStages over the distinct (source, token) pairs),
    * splitmix ranks, the per-source bottom-k sketches, union ranks with
    * the (rank, value) tie-break, and the KMV estimators with the exact
    * 2⁻⁶⁴-affine density map. The one non-replayable branch is an exact
    * 64-bit rank collision between distinct hashes (first-arrival vs
    * arbitrary SQL tie — the standard documented sketch-determinism
    * argument, probability ≈ k²·2⁻⁶⁴ per source). */
  lazy val sketchOverlapSql: String = {
    val k = 256
    val mixSeed = java.lang.Long.toUnsignedString(SketchAggs.mix(42L))
    val scale = math.pow(2, -64).toString
    val (ctes, last) = layeredCte(
      "SELECT DISTINCT source, tok FROM (SELECT source, " +
        "unnest(string_split(text, ' ')) AS tok FROM documents)",
      strHashStages("tok", "th").map(Seq(_)), "so0")
    val r = toSigned(mixSql(xorS(toUnsigned("hv"), mixSeed)))
    s"""WITH $ctes,
       |dv AS (
       |  SELECT DISTINCT source, ${toSigned("th_u")} AS hv FROM $last
       |), rk AS MATERIALIZED (
       |  SELECT source, hv, $r AS r FROM dv
       |), sk AS (
       |  SELECT source, hv, r FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY source ORDER BY r ASC) AS rn FROM rk)
       |  WHERE rn <= $k
       |), srcs AS (
       |  SELECT DISTINCT source FROM sk
       |), pr AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a JOIN srcs b ON a.source < b.source
       |), u AS (
       |  SELECT pr.src_a, pr.src_b, e.hv AS v, e.r, count(*) AS n_src
       |  FROM pr JOIN sk e ON e.source = pr.src_a OR e.source = pr.src_b
       |  GROUP BY 1, 2, 3, 4
       |), kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY src_a, src_b ORDER BY r ASC, v ASC) AS rn
       |    FROM u)
       |  WHERE rn <= $k
       |), agg AS (
       |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS k_union,
       |    CAST(sum(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_common,
       |    max(r) AS hk
       |  FROM kept GROUP BY 1, 2
       |), est AS (
       |  SELECT src_a, src_b, k_union, n_common,
       |    CASE WHEN k_union < $k THEN CAST(k_union AS DOUBLE)
       |      ELSE CAST(${k - 1} AS DOUBLE)
       |        / (CAST(hk AS DOUBLE) * $scale + 0.5) END AS est_union
       |  FROM agg
       |)
       |SELECT src_a, src_b, k_union, n_common, est_union,
       |  CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE) AS jaccard_est,
       |  (CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE)) * est_union
       |    AS est_common
       |FROM est
       |ORDER BY src_a, src_b""".stripMargin
  }

  /** q_sketch_delta replay — Extended.sketchDelta's pinned shape (k =
    * 256, seed 42, snapshots = doc_id parity, grouped by lang): the
    * sketchOverlap replay applied to the difference identities — DuckDB
    * rebuilds both per-(lang, side) sketches from raw text, takes the k
    * smallest union ranks, and counts batch-only / corpus-only members
    * with the same (rank, value) tie-break and 2⁻⁶⁴-affine density
    * map. */
  lazy val sketchDeltaSql: String = {
    val k = 256
    val mixSeed = java.lang.Long.toUnsignedString(SketchAggs.mix(42L))
    val scale = math.pow(2, -64).toString
    val (ctes, last) = layeredCte(
      "SELECT DISTINCT lang, side, tok FROM (SELECT lang, " +
        "doc_id % 2 AS side, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents)",
      strHashStages("tok", "th").map(Seq(_)), "sd0")
    val r = toSigned(mixSql(xorS(toUnsigned("hv"), mixSeed)))
    s"""WITH $ctes,
       |dv AS (
       |  SELECT DISTINCT lang, side, ${toSigned("th_u")} AS hv FROM $last
       |), rk AS MATERIALIZED (
       |  SELECT lang, side, hv, $r AS r FROM dv
       |), sk AS (
       |  SELECT lang, side, hv, r FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY lang, side ORDER BY r ASC) AS rn FROM rk)
       |  WHERE rn <= $k
       |), u AS (
       |  SELECT lang, hv AS v, r, max(side) AS mx, min(side) AS mn
       |  FROM sk GROUP BY 1, 2, 3
       |), kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY lang ORDER BY r ASC, v ASC) AS rn
       |    FROM u)
       |  WHERE rn <= $k
       |), agg AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS k_union,
       |    CAST(sum(CASE WHEN mn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_batch_only,
       |    CAST(sum(CASE WHEN mx = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_corpus_only,
       |    max(r) AS hk
       |  FROM kept GROUP BY 1
       |), est AS (
       |  SELECT lang, k_union, n_batch_only, n_corpus_only,
       |    CASE WHEN k_union < $k THEN CAST(k_union AS DOUBLE)
       |      ELSE CAST(${k - 1} AS DOUBLE)
       |        / (CAST(hk AS DOUBLE) * $scale + 0.5) END AS est_union
       |  FROM agg
       |)
       |SELECT lang, k_union, n_batch_only, n_corpus_only, est_union,
       |  (CAST(n_batch_only AS DOUBLE) / CAST(k_union AS DOUBLE))
       |    * est_union AS est_novel
       |FROM est
       |ORDER BY lang""".stripMargin
  }

  /** q_hll_distinct replay — Extended.hllDistinct's pinned shape (p = 8
    * → 256 registers, seed 42 over lineitem's l_orderkey per
    * l_returnflag): DuckDB re-derives every register from the DISTINCT
    * value set (HLL registers are max-aggregates, so distinct suffices),
    * with the rank's leading-zero count computed EXACTLY via bin()
    * string length (no libm log2), then replays the raw estimator:
    * term 2^−M[j] is an exact power-of-two reciprocal, the Σ is a
    * register-index-ascending left fold seeded 0.0 (IEEE-identical to
    * the aggregate's loop), and α_m·m·m/Σ is two exact power-of-two
    * scalings and one correctly-rounded division. α_m is evaluated
    * through SketchAggs.hllAlpha — the very constant the aggregate
    * uses — and embedded as an exact decimal literal. */
  /** Shared HLL register/estimator replay: rebuild the p = 8 registers
    * for an arbitrary group-key tuple from a `dvSql` producing
    * (keys..., v) DISTINCT rows, then replay the raw estimator with the
    * pinned bucket-ascending left fold. `exactSql` supplies the
    * (keys..., <exactCol>) exact twin column. */
  private def hllReplaySql(dvSql: String, keys: Seq[String],
      exactSql: String, exactCol: String): String = {
    val p = 8; val m = 1 << p
    val mixSeed = java.lang.Long.toUnsignedString(SketchAggs.mix(42L))
    val alpha = new java.math.BigDecimal(SketchAggs.hllAlpha(m)).toPlainString
    val shift = java.math.BigInteger.ONE.shiftLeft(64 - p) // 2^56
    val h = mixSql(xorS("CAST(v AS HUGEINT)", mixSeed))
    val ks = keys.mkString(", ")
    val gks = keys.map(k => s"g.$k").mkString(", ")
    val on = keys.map(k => s"r.$k = g.$k").mkString(" AND ")
    s"""WITH dv AS (
       |  $dvSql
       |), h AS MATERIALIZED (
       |  SELECT $ks, $h AS hu FROM dv
       |), b AS MATERIALIZED (
       |  SELECT $ks, hu // $shift AS bucket,
       |    CAST(hu % $shift AS BIGINT) AS wlow
       |  FROM h
       |), r AS (
       |  SELECT $ks, bucket,
       |    max(CASE WHEN wlow = 0 THEN ${64 - p + 1}
       |        ELSE ${64 - p + 1} - length(bin(wlow)) END) AS rho
       |  FROM b GROUP BY ALL
       |), grid AS (
       |  SELECT $gks, g2.range AS bucket
       |  FROM (SELECT DISTINCT $ks FROM dv) g, range($m) g2
       |), t AS (
       |  SELECT $gks, g.bucket, coalesce(r.rho, 0) AS rho,
       |    CAST(1 AS DOUBLE)
       |      / CAST(CAST(1 AS BIGINT) << coalesce(r.rho, 0) AS DOUBLE) AS term
       |  FROM grid g LEFT JOIN r
       |    ON $on AND r.bucket = g.bucket
       |), agg AS (
       |  SELECT $ks,
       |    list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |      list(term ORDER BY bucket)), (a, b) -> a + b) AS s,
       |    CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
       |  FROM t GROUP BY ALL
       |), x AS (
       |  $exactSql
       |)
       |SELECT ${keys.map(k => s"a.$k").mkString(", ")},
       |  CAST('$alpha' AS DOUBLE) * $m * $m / s AS hll_est,
       |  n_zero, $exactCol
       |FROM agg a JOIN x USING ($ks)
       |ORDER BY $ks""".stripMargin
  }

  lazy val hllDistinctSql: String = hllReplaySql(
    "SELECT DISTINCT l_returnflag, l_orderkey AS v FROM lineitem",
    Seq("l_returnflag"),
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS true_distinct
      |  FROM lineitem GROUP BY 1""".stripMargin,
    "true_distinct")

  /** q_window_hll replay — Extended.windowHll's pinned shape: the same
    * register rebuild keyed by (6h tumbling window, event_type); the
    * window start is DuckDB's time_bucket, which equals Spark's
    * window() origin for epoch-aligned tumbling windows (the
    * q_event_windows precedent). */
  /** q_hll_merge replay — Extended.hllMergeMv's pinned shape: the
    * oracle recomputes the sketch from the FULL distinct (event_type,
    * user_id) set with no knowledge of the query's 4-shard store-merge
    * path — the hash match is the proof that stored-state merge ≡
    * one-pass sketch, register for register. */
  lazy val hllMergeSql: String = hllReplaySql(
    "SELECT DISTINCT event_type, user_id AS v FROM events",
    Seq("event_type"),
    """SELECT event_type, count(DISTINCT user_id) AS true_users
      |  FROM events GROUP BY 1""".stripMargin,
    "true_users")

  lazy val windowHllSql: String = hllReplaySql(
    """SELECT DISTINCT time_bucket(INTERVAL '6 hours', ts) AS w_start,
      |    event_type, user_id AS v FROM events""".stripMargin,
    Seq("w_start", "event_type"),
    """SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start, event_type,
      |    count(DISTINCT user_id) AS true_users
      |  FROM events GROUP BY 1, 2""".stripMargin,
    "true_users")

  /** q_hash_quantiles replay — Extended.hashQuantiles' pinned shape
    * (k = 500, seed 42, key = the UNIQUE o_orderkey): the sample is the
    * k rows with smallest (signed splitmix hash, key) per o_orderstatus
    * — replayed exactly, including hash-collision tie-breaks — and each
    * quantile is the sorted sample's ⌊q·(n−1)⌋+1-th raw value: integer
    * indexing only, the measured doubles pass through untouched. */
  lazy val hashQuantilesSql: String = {
    val mixSeed = java.lang.Long.toUnsignedString(SketchAggs.mix(42L))
    val h = mixSql(xorS("CAST(o_orderkey AS HUGEINT)", mixSeed))
    s"""WITH h AS MATERIALIZED (
       |  SELECT o_orderstatus, o_totalprice, o_orderkey,
       |    ${toSigned(h)} AS hs
       |  FROM orders
       |), r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY o_orderstatus ORDER BY hs ASC, o_orderkey ASC) AS rn
       |  FROM h
       |), sm AS (
       |  SELECT * FROM r WHERE rn <= 500
       |), agg AS (
       |  SELECT o_orderstatus, count(*) AS n,
       |    list(o_totalprice ORDER BY o_totalprice) AS ps
       |  FROM sm GROUP BY 1
       |)
       |SELECT o_orderstatus, CAST(n AS INT) AS n_sample,
       |  ps[CAST((n - 1) // 2 + 1 AS INT)] AS p50_price,
       |  ps[CAST((n - 1) * 9 // 10 + 1 AS INT)] AS p90_price
       |FROM agg
       |ORDER BY o_orderstatus""".stripMargin
  }
}
