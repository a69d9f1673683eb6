package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** DuckDB replay SQL for the logistic-regression family — the r15
  * extension of the embed-fitted-state device (centroid embed,
  * Embeddings.buildSemDedupOracleSql; codebook embed, Extended's PQ
  * oracles) to trained classifiers.
  *
  * The training loop (L-BFGS treeAggregate, float-order-dependent)
  * stays Spark-side and spec-gated; what the oracle replays is the
  * PURE FUNCTION the fitted model applies to the data:
  *
  *  - prediction at the default 0.5 threshold is `margin > 0`
  *    (LogisticRegressionModel.raw2prediction with rawThreshold
  *    log(0.5/0.5) = 0) — a dot product of embedded coefficient
  *    literals against replayed features, no sigmoid and therefore no
  *    libm anywhere in the confusion replay;
  *  - probability bucketing `round(sigmoid(margin), 3)` (the
  *    q_linkpred_e2e sweep key) is replayed libm-FREE through a
  *    precomputed margin-space cutoff table: bucket boundaries are a
  *    pure, data-independent function of the JVM's
  *    `1/(1+Math.exp(-m))` followed by Spark's HALF_UP decimal round,
  *    monotone in m (Math.exp is semi-monotonic by its Java spec), so
  *    1001 binary-searched Double cutoffs classify EVERY margin double
  *    exactly and ship as literals like any other embedded constant
  *    (LrReplaySqlSpec pins the table against Spark's own
  *    round(sigmoid) on a dense margin grid).
  *
  * Margin fold order: MLlib's BLAS.dot is a strict ascending-index
  * loop (sum += w(i)·x(i)), so the SQL writes the same left-assoc
  * chain ((w1·x1 + w2·x2) + …) + intercept. A sparse assembled vector
  * (VectorAssembler compresses at low nnz) skips zero features, which
  * can only perturb the sign of a ±0.0 partial — irrelevant to both
  * the > 0 predicate and the cutoff compare (−0.0 ⋚ c ≡ +0.0 ⋚ c for
  * the nonzero cutoffs below).
  */
object LrReplaySql {

  /** Left-assoc margin chain over replayed feature expressions, with
    * coefficient/intercept doubles embedded via round-trip toString
    * (SparkEntry.sqlDouble's exponent-form discipline, inlined here to
    * keep this object self-contained). */
  def marginSql(features: Seq[String], coefficients: Array[Double],
      intercept: Double): String = {
    require(features.length == coefficients.length,
      s"${features.length} features vs ${coefficients.length} coefficients")
    val dot = features.zip(coefficients)
      .map { case (f, w) => s"(${lit(w)} * ($f))" }
      .reduceLeft((a, b) => s"($a + $b)")
    s"($dot + ${lit(intercept)})"
  }

  private def lit(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  // ---- q_quality_classifier ----

  /** Confusion replay for ml.QualityFilter.confusion: features,
    * weak label, md5 holdout split and assembler-skip guard replayed
    * from `documents`; the fitted (coefficients, intercept) embedded;
    * prediction = margin > 0. Feature order pins the VectorAssembler
    * inputCols (avg_token_len, distinct_ratio, chars). */
  def qualityClassifierSql(coefficients: Array[Double],
      intercept: Double): String = {
    require(coefficients.length == 3, coefficients.mkString(","))
    val margin = marginSql(Seq("x1", "x2", "x3"), coefficients, intercept)
    s"""WITH t AS (
       |  SELECT doc_id, n_chars,
       |    len(string_split(text, ' ')) AS nt,
       |    len(list_distinct(string_split(text, ' '))) AS nd
       |  FROM documents
       |), feat AS (
       |  SELECT doc_id,
       |    CAST(n_chars AS DOUBLE) / CAST(nt AS DOUBLE) AS x1,
       |    CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE) AS x2,
       |    CAST(n_chars AS DOUBLE) AS x3,
       |    CASE WHEN nt >= 20 AND 20 * (nt - nd) <= 13 * nt
       |         THEN 1 ELSE 0 END AS label
       |  FROM t
       |), hold AS (
       |  -- the md5-salted holdout third + the assembler's handleInvalid
       |  -- = skip guard (null/NaN features never reach the model)
       |  SELECT * FROM feat
       |  WHERE substr(md5('qf:' || CAST(doc_id AS VARCHAR)), 1, 1)
       |          IN ('0', '1', '2')
       |    AND x1 IS NOT NULL AND x2 IS NOT NULL AND x3 IS NOT NULL
       |    AND NOT (isnan(x1) OR isnan(x2) OR isnan(x3))
       |)
       |SELECT CAST(label AS BIGINT) AS label,
       |  CAST(CASE WHEN $margin > 0e0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       |  count(*) AS n
       |FROM hold
       |GROUP BY 1, 2
       |ORDER BY label, pred""".stripMargin
  }

  // ---- round(sigmoid(margin), 3) bucket cutoffs ----

  /** Spark's p1-bucket function: probability(1) exactly as
    * LogisticRegressionModel.raw2probabilityInPlace computes it, then
    * Round(_, 3) exactly as Spark's Round codegen evaluates it for
    * DoubleType — `BigDecimal.valueOf(d)` (the SHORTEST-decimal
    * representation, NOT the exact binary expansion; 0.0615 stored as
    * 0.06149999… rounds UP through valueOf where the exact expansion
    * would round down) then HALF_UP at scale 3 — returned as the
    * bucket index j (p1r = j/1000). Non-decreasing in m: exp is
    * semi-monotonic (Java spec), 1/(1+e) is a monotone composition of
    * correctly-rounded ops, shortest-repr preserves double order, and
    * the decimal round is monotone.
    *
    * exp is STRICTMATH here, deliberately: Math.exp (what the ml
    * scoring path calls) is JIT-state-dependent — interpreted frames
    * delegate to StrictMath's fdlibm, C2-compiled frames use the x86
    * intrinsic, and the two differ by 1 ulp on some inputs — so a
    * cutoff table built through Math.exp would itself vary with the
    * building JVM's warmup state. StrictMath pins the table
    * bit-reproducibly; the residual risk is a data margin falling
    * within that 1 intrinsic-vs-fdlibm ulp of one of the 1000 bucket
    * boundaries (≲1e-12 of the double line near the sigmoid's active
    * range; the same order as the intra-doc xxh64-collision arguments
    * the token oracles already carry — and irreducible anyway, since
    * Spark's OWN scoring of boundary-straddling rows can flip buckets
    * between interpreted and compiled executions of the same query). */
  private[graft] def p1Bucket(m: Double): Int = {
    val p1 = 1.0 / (1.0 + StrictMath.exp(-m))
    JBigDecimal.valueOf(p1).setScale(3, RoundingMode.HALF_UP)
      .movePointRight(3).intValueExact()
  }

  /** cutoffs(j) = the smallest double m with p1Bucket(m) ≥ j, for
    * j = 1..1000 (bucket 0 needs no lower cutoff) — found by binary
    * search over the monotone total order of finite doubles. Data- and
    * model-independent constants, computed once. */
  lazy val p1BucketCutoffs: IndexedSeq[Double] = {
    // bits-ordered binary search on [-50, 50]: sigmoid saturates to
    // bucket 0 / 1000 well inside that range (e^-50 ≈ 2e-22)
    def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
    def fromBits(l: Long): Double = java.lang.Double.longBitsToDouble(l)
    // map signed-magnitude double bits onto a monotone Long line
    def ord(d: Double): Long = {
      val b = bits(d); if (b >= 0L) b else Long.MinValue - b
    }
    def unord(o: Long): Double =
      if (o >= 0L) fromBits(o) else fromBits(Long.MinValue - o)
    val lo0 = ord(-50.0); val hi0 = ord(50.0)
    (1 to 1000).map { j =>
      var lo = lo0; var hi = hi0 // invariant: bucket(lo) < j ≤ bucket(hi)
      require(p1Bucket(unord(lo)) < j && p1Bucket(unord(hi)) >= j, s"j=$j")
      // (hi - lo) spans ~2·bits(50.0) ≈ 9.3e18 at the first step — past
      // Long.MaxValue — so halve through the UNSIGNED shift (hi > lo
      // always, so the wrapped difference >>> 1 is exactly ⌊d/2⌋)
      while (java.lang.Long.compareUnsigned(hi - lo, 1L) > 0) {
        val mid = lo + ((hi - lo) >>> 1)
        if (p1Bucket(unord(mid)) >= j) hi = mid else lo = mid
      }
      unord(hi)
    }
  }

  /** The cutoff table as a DuckDB CTE `p1cut(cut)` (one row per bucket
    * boundary, ascending). Because the cutoffs ascend, the bucket index
    * of a margin m is simply COUNT(cutoffs ≤ m), and the p1r threshold
    * double is CAST(j AS DOUBLE)/1000 — the correctly-rounded quotient,
    * the same double Spark's Round emits for j/1000. */
  def p1cutCte: String = {
    val rows = p1BucketCutoffs.map(c => s"(${lit(c)})").mkString(", ")
    s"p1cut(cut) AS MATERIALIZED (\n  SELECT * FROM (VALUES $rows) v(cut)\n)"
  }

  /** Bucketing expression over a margin column (COUNT ≤ form; DuckDB
    * plans the uncorrelated-table scalar as a join-aggregate). */
  def p1rExpr(marginCol: String): String =
    s"CAST((SELECT count(*) FROM p1cut WHERE cut <= $marginCol) " +
      s"AS DOUBLE) / 1000e0"

  // ---- q_linkpred_e2e ----

  /** SQL string literal with '' escaping. */
  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** q_linkpred_e2e replay (r15) — the reference-p1 pipeline
    * (Extended.linkpredE2e) re-derived from `documents` with the
    * session's fitted LR coefficients embedded:
    *
    *  - the node table's derived columns (year = 1993 + n_chars%10,
    *    title = first-5-token join, authors = source,lang, journal =
    *    lang, abstract = text) and LinkPredictor.prepareNodes'
    *    tokenize(lower, \\s+) + english-stopword filter, replayed with
    *    the stopword list embedded from the SAME
    *    StopWordsRemover.loadDefaultStopWords call the operator uses;
    *  - the deterministic 1/3 source-block keep
    *    (pmod(xxhash64(source), 3) = 0 — XxhReplaySql.strHashStages on
    *    the distinct-source vocabulary), the blocked a<b pair join, and
    *    the (a_id+b_id)%3 = 0 candidate split;
    *  - the candidate label via its own pair jaccard ≥ 0.5 — provably ≡
    *    the query's left-outer membership probe against gt, because gt
    *    is exactly the label-1 subset of the same pair set and
    *    candidates are a subset of it (string ids compare equal iff the
    *    longs do);
    *  - the five features (year diff, same journal, and the THREE
    *    multiset common-word counts via the q_multiset_pairs
    *    least(count,count) device — title, abstract, authors);
    *  - margin from embedded coefficients, p1r = round(sigmoid, 3) via
    *    the libm-free cutoff table (p1cutCte), and the
    *    threshold-sweep cumsums (the q_threshold_sweep replay shape,
    *    with the total_pos = 0 and precision+recall = 0 conventions).
    */
  def linkpredE2eSql(coefficients: Array[Double], intercept: Double,
      stopwords: Seq[String]): String = {
    require(coefficients.length == 5, coefficients.mkString(","))
    val stop = stopwords.map(sqlStr).mkString("(", ", ", ")")
    val xr = XxhReplaySql
    val (srcCtes, srcLast) = xr.layeredCte(
      "SELECT DISTINCT source FROM documents",
      xr.strHashStages("source", "sh").map(Seq(_)), "sb0")
    val margin = marginSql(
      Seq("x1", "x2", "x3", "x4", "x5"), coefficients, intercept)
    // one (doc, token, count) multiset per token family, joined per
    // candidate pair and folded with least() — q_multiset_pairs' device
    def mcnt(toksCol: String, cnt: String, out: String): String =
      s"""$cnt AS (
         |  SELECT doc_id, w, count(*) AS n
         |  FROM (SELECT doc_id, unnest($toksCol) AS w FROM prep)
         |  GROUP BY doc_id, w
         |), $out AS (
         |  SELECT c.a_id, c.b_id, sum(least(x.n, y.n)) AS v
         |  FROM cand c
         |  JOIN $cnt x ON x.doc_id = c.a_id
         |  JOIN $cnt y ON y.doc_id = c.b_id AND y.w = x.w
         |  GROUP BY c.a_id, c.b_id
         |)""".stripMargin
    s"""WITH ${p1cutCte},
       |$srcCtes,
       |keptsrc AS (
       |  SELECT source FROM $srcLast
       |  WHERE ((${xr.toSigned("sh_u")} % 3) + 3) % 3 = 0
       |),
       |nd AS (
       |  SELECT doc_id, source, lang, n_chars, text,
       |    string_split(text, ' ') AS t0
       |  FROM documents
       |),
       |prep AS MATERIALIZED (
       |  SELECT doc_id, source, lang,
       |    1993 + (n_chars % 10) AS yr,
       |    list_filter(string_split_regex(
       |      lower(array_to_string(t0[1:5], ' ')), '\\s+'),
       |      w -> w NOT IN $stop) AS ttoks,
       |    list_filter(string_split_regex(lower(text), '\\s+'),
       |      w -> w NOT IN $stop) AS atoks,
       |    string_split(concat_ws(',', source, lang), ',') AS autoks,
       |    list_distinct(t0) AS tset
       |  FROM nd
       |),
       |pr AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.yr AS a_yr, b.yr AS b_yr, a.lang AS a_lang, b.lang AS b_lang,
       |    CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE) /
       |      CAST(len(a.tset) + len(b.tset)
       |           - len(list_intersect(a.tset, b.tset)) AS DOUBLE) AS jac
       |  FROM prep a
       |  JOIN prep b ON a.source = b.source AND a.doc_id < b.doc_id
       |  JOIN keptsrc k ON k.source = a.source
       |  WHERE (a.doc_id + b.doc_id) % 3 = 0
       |),
       |cand AS MATERIALIZED (
       |  SELECT a_id, b_id, a_yr, b_yr, a_lang, b_lang,
       |    CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END AS label
       |  FROM pr
       |),
       |${mcnt("ttoks", "tcnt", "ctw")},
       |${mcnt("atoks", "acnt", "caw")},
       |${mcnt("autoks", "aucnt", "cau")},
       |feat AS (
       |  SELECT c.a_id, c.b_id, c.label,
       |    CAST(abs(c.a_yr - c.b_yr) AS DOUBLE) AS x1,
       |    CASE WHEN c.a_lang = c.b_lang THEN 1e0 ELSE 0e0 END AS x2,
       |    CAST(coalesce(t.v, 0) AS DOUBLE) AS x3,
       |    CAST(coalesce(w.v, 0) AS DOUBLE) AS x4,
       |    CAST(coalesce(u.v, 0) AS DOUBLE) AS x5
       |  FROM cand c
       |  LEFT JOIN ctw t ON t.a_id = c.a_id AND t.b_id = c.b_id
       |  LEFT JOIN caw w ON w.a_id = c.a_id AND w.b_id = c.b_id
       |  LEFT JOIN cau u ON u.a_id = c.a_id AND u.b_id = c.b_id
       |),
       |bk AS (
       |  SELECT f.a_id, f.b_id, f.label, count(c.cut) AS j
       |  FROM (SELECT a_id, b_id, label, $margin AS m FROM feat) f
       |  LEFT JOIN p1cut c ON c.cut <= f.m
       |  GROUP BY f.a_id, f.b_id, f.label
       |),
       |grouped AS (
       |  SELECT CAST(j AS DOUBLE) / 1000e0 AS threshold,
       |    sum(label) AS pos, count(*) AS tot
       |  FROM bk GROUP BY 1
       |),
       |cum AS (
       |  SELECT threshold,
       |    sum(pos) OVER (ORDER BY threshold DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
       |    sum(tot) OVER (ORDER BY threshold DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pred,
       |    sum(pos) OVER () AS total_pos
       |  FROM grouped
       |),
       |pr2 AS (
       |  SELECT threshold,
       |    CAST(cum_tp AS DOUBLE) / CAST(cum_pred AS DOUBLE) AS precision,
       |    CASE WHEN total_pos = 0 THEN 0e0
       |         ELSE CAST(cum_tp AS DOUBLE) / CAST(total_pos AS DOUBLE)
       |    END AS recall
       |  FROM cum
       |)
       |SELECT threshold, precision, recall,
       |  CASE WHEN precision + recall = 0e0 THEN 0e0
       |       ELSE 2e0 * precision * recall / (precision + recall)
       |  END AS f1
       |FROM pr2
       |ORDER BY threshold DESC""".stripMargin
  }
}
