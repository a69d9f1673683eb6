package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) similarity self-join — the string
  * twin of the embedding/shingle near-dup family: entity resolution on
  * names/titles/ids, spell-variant collapse, OCR noise clustering.
  * Spark has the `levenshtein` scalar but no sub-quadratic JOIN on it;
  * this is the deletion-neighborhood (FastSS / SymSpell) scheme:
  *
  *   ed(s, t) <= d  ==>  Del_<=d(s) ∩ Del_<=d(t) != ∅
  *
  * where Del_<=d(x) is every string obtainable by deleting at most d
  * characters from x. (Take an optimal alignment: delete from s the
  * positions it substitutes or deletes, from t the positions it
  * substitutes or inserts — both reach the common matched subsequence
  * with <= d deletions each.) So generating each string's deletion
  * variants, equi-joining on the variant, and exact-verifying the
  * distinct candidate pairs with `levenshtein` is COMPLETE — no banding
  * miss to argue about, which is why the driver query carries a full
  * brute-force DuckDB oracle rather than a recall gate.
  *
  * Scale posture: the join key is the variant STRING — cardinality
  * scales with the corpus (no low-cardinality block key), and a bucket
  * holds only strings within mutual distance ~2d, so bucket size is
  * data-inherent (a million identical names is a million-member true
  * near-dup class — the output itself is quadratic there, like the
  * valve-collapsed pair family). The variant fan-out is Σ_{k<=d} C(l,k)
  * per string (19 rows at l=18, d=1; 172 at d=2) — the scheme is for
  * SHORT strings (names, titles, tokens; the SymSpell regime). For long
  * documents, near-dup at small RELATIVE distance is the shingle tier
  * (minhash/winnow); char-level ed on documents is not a useful metric.
  *
  * Unicode: variants are built over UTF-16 code units (Spark's
  * substring/length), and `levenshtein` verifies the same way — exact
  * for BMP text; supplementary-plane chars count as 2 units both in
  * blocking and verify, consistently.
  */
object EditDistanceJoin {

  /** Array of all distinct strings obtainable from `c` by deleting at
    * most `d` characters (the string itself included). Built by d
    * rounds of single-deletion expansion + distinct — each round is a
    * pure higher-order-function expression (no UDF), so the whole
    * neighborhood stays inside codegen. */
  private[graft] def deletionVariants(c: Column, d: Int): Column = {
    def singleDeletes(x: Column): Column =
      transform(sequence(lit(1), length(x)),
        i => concat(x.substr(lit(1), i - 1), x.substr(i + 1, length(x))))
    var acc = array(c)
    for (_ <- 1 to d)
      acc = array_distinct(concat(acc,
        flatten(transform(acc, x => singleDeletes(x)))))
    acc
  }

  /** Self-join: (a_id, b_id, dist) with a_id < b_id, each qualifying
    * pair exactly once, dist = levenshtein <= maxDist. `idCol` must be
    * unique and orderable; rows with null strings are dropped.
    *
    * EXACT-TWIN COLLAPSE VALVE (the family discipline — DupProbe +
    * rep-level direct join + join-wise expansion): identical strings
    * have identical deletion neighborhoods, so on a dup-heavy corpus
    * every variant bucket's membership (and the candidate verify work)
    * multiplies by dup². Above the measured crossover the direct join
    * runs once per distinct string; member pairs inherit the class-pair
    * distance (levenshtein is a function of the strings), and
    * intra-class pairs are dist 0 — exactly what the direct join
    * returns for them. Output is still quadratic in a true duplicate
    * class (that IS the answer); the valve removes the redundant
    * blocking/verify work, not the rows. */
  /** Deletion-variant mass is QUADRATIC in string length (len variants
    * × ~len units each at d=1): one 10⁶-unit string expands to ~1 TB of
    * join keys — an executor OOM no partitioning fixes. The scheme is
    * for the SymSpell regime (names/titles/tokens); the r17 heavy-tail
    * arm is what made the missing guard concrete. The gate is PER-ROW
    * and lazy (a raise_error branch inside the plan — no extra scan, no
    * eager job): the first over-long string fails the task loudly,
    * naming the shingle tier as the long-document path. 4096 UTF-16
    * units ≈ 32 MB of variants per string at d=1 — two decades above
    * any name/title corpus, well under executor budgets. */
  val MaxStringLen = 4096

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val guarded = when(length(col(strCol)) <= MaxStringLen, col(strCol))
      .otherwise(raise_error(concat(
        lit(s"editDistanceJoin: string length "), length(col(strCol)),
        lit(s" exceeds MaxStringLen=$MaxStringLen — deletion-variant " +
          "mass is quadratic in length (the SymSpell regime is " +
          "names/titles/tokens). For long documents use the shingle " +
          "near-dup tiers (minhashNearDup / winnow / spanDedup) — " +
          "char-level edit distance is not a useful metric there."))))
    val base = df.select(col(idCol).as("__id"), guarded.as("__s"))
      .filter(col("__s").isNotNull)
    val dupFactor = DupProbe.dupFactor(base, col("__s"))
    if (dupFactor < DupProbe.CollapseDupFactor) directJoin(base, maxDist)
    else {
      import org.apache.spark.sql.expressions.Window
      // hash-prefixed twin key (the r14 lshTopKCollapsed discipline:
      // the shuffle key is 8 bytes, the string only tiebreaks in-part)
      val wTwin = Window.partitionBy(col("__vh"), col("__s"))
      val keyed = base.withColumn("__vh", xxhash64(col("__s")))
        .withColumn("rep", min(col("__id")).over(wTwin))
        .withColumn("csize", count(lit(1)).over(wTwin))
      val memb = keyed.select(col("rep"), col("__id"))
      val reps = keyed.filter(col("__id") === col("rep"))
        .select(col("__id"), col("__s"))
      val cross = directJoin(reps, maxDist)
        .join(memb.select(col("rep").as("a_id"), col("__id").as("x")), "a_id")
        .join(memb.select(col("rep").as("b_id"), col("__id").as("y")), "b_id")
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"), col("dist"))
      val intra = keyed.filter(col("__id") === col("rep") && col("csize") >= 2)
        .select(col("rep"))
        .join(memb.select(col("rep"), col("__id").as("x")), "rep")
        .join(memb.select(col("rep"), col("__id").as("y")), "rep")
        .filter(col("x") < col("y"))
        .select(col("x").as("a_id"), col("y").as("b_id"),
          lit(0).as("dist"))
      cross.unionByName(intra)
    }
  }

  private def directJoin(base: DataFrame, maxDist: Int): DataFrame = {
    val posts = base.select(col("__id"), col("__s"), length(col("__s")).as("__l"),
        explode(deletionVariants(col("__s"), maxDist)).as("__v"))
    // |len(a) - len(b)| <= d is implied by ed <= d; filtering it inside
    // the variant join prunes cross-length bucket members before the
    // pair-level distinct.
    val cand = posts.as("a").join(posts.as("b"),
        col("a.__v") === col("b.__v") &&
          col("a.__id") < col("b.__id") &&
          abs(col("a.__l") - col("b.__l")) <= maxDist)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__s").as("__sa"), col("b.__s").as("__sb"))
      // pair-level dedup keyed on the two LONGS, not the strings: __id
      // is unique (selfJoin contract), so (a_id, b_id) functionally
      // determines (__sa, __sb) and min() just returns the one value —
      // rows identical to distinct() on all four columns, but the
      // exchange + hash-agg compare 16 bytes instead of hashing two
      // strings per row (guide §2.3 "shuffle keys, not payloads";
      // measured 3.9 → 2.5 s on the sf0.1 candidate set).
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(col("__sa")).as("__sa"), min(col("__sb")).as("__sb"))
    // Thresholded levenshtein (guide §4 — cheapest built-in that fits):
    // the 3-arg form runs the BANDED O(maxDist·len) DP with early exit
    // and returns -1 past the bound, vs the full O(len²) matrix of the
    // 2-arg form. Exact-equivalent: for every surviving row the returned
    // value IS the true distance (≤ maxDist ⟺ result ≥ 0), so rows and
    // dist values are bit-identical to the unthresholded filter —
    // measured 4.7 s → ~1 s on the sf0.1 candidate set (~1M pairs).
    cand.withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
