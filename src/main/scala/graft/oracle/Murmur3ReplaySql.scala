package graft

/** DuckDB replay SQL for the reference's p2 program
  * (q_similarity_join_p2) — the last reference-shape query still
  * rows-only. The whole pipeline downstream of the Bernoulli sample is
  * a pure function of (text, three seeded integer pairs): Tokenizer
  * split, bigram shingles, ml.HashingTF's Murmur3 x86_32 (seed 42,
  * `hashUnsafeBytes2`, little-endian words, standard accumulated tail —
  * the SPARK_3_MURMUR3_HASH path of HashingTF.indexOf) mod 4096,
  * MLlib MinHashLSH's per-table `min(((1+idx)·a + b) mod 2038074743)`,
  * the OR-construction bucket join of approxSimilarityJoin, and the
  * exact index-set Jaccard of `keyDistance`. DuckDB recomputes all of
  * it from the raw `documents` parquet.
  *
  * The two session facts that cannot be recomputed SQL-side are
  * embedded as literals, the r13/r14 centroid-embed discipline:
  *  - the sampled doc_id set (Spark's partition-seeded Bernoulli
  *    sampler, S5) — collected once by Extended.prepareP2Oracle from
  *    the SAME plan prefix the query runs;
  *  - the three MinHash coefficient pairs — read via reflection off a
  *    model fitted by the very SimilarityJoin.fitMinHash the query
  *    calls (seed 42), so there is no reimplementation to drift.
  *
  * Float discipline: similarity mirrors MLlib's exact operation order
  * `1.0 - (1.0 - i/u)` with i, u exact small integers — both engines'
  * IEEE division/subtraction are correctly rounded, so the doubles
  * match bit-for-bit.
  *
  * Murmur3 formulation reuses XxhReplaySql's HUGEINT framework at
  * 32-bit width: values live in [0, 2^32), `mod32` wraps, products of
  * two 32-bit values fit HUGEINT directly, rotations are divmod by
  * powers of two. The word loop is a `list_reduce` fold over the
  * little-endian 4-byte words of the UTF8 byte list; the tail bytes
  * accumulate into one k1 whose disjoint byte lanes make XOR == sum
  * (and mixK1(0) = 0, so the empty tail needs no CASE).
  */
object Murmur3ReplaySql {
  import XxhReplaySql.{byteStages, layeredCte, xorS}

  private val M32 = "4294967296"
  private def mod32(x: String) = s"(($x) % $M32)"
  // a, b < 2^32 so the raw product < 2^64 fits int128 with no splitting
  private def mul32(a: String, b: String) = mod32(s"($a) * ($b)")
  private def rotl32(x: String, r: Int): String = {
    val lo = 1L << (32 - r)
    s"((($x) % $lo) * ${1L << r} + ($x) // $lo)"
  }
  private def shr(x: String, r: Int) = s"(($x) // ${1L << r})"

  private val C1 = "3432918353" // 0xcc9e2d51
  private val C2 = "461845907"  // 0x1b873593
  private def mixK1(k: String): String = mul32(rotl32(mul32(k, C1), 15), C2)
  // mixH1 without the leading xor (staged by the caller)
  private def mixH1Tail(hx: String): String =
    mod32(s"${rotl32(hx, 13)} * 5 + 3864292196") // 0xe6546b64

  /** Stages computing Murmur3_x86_32(utf8($strCol), seed=42) into
    * `{out}_u` (unsigned 32-bit), per HashingTF's hashUnsafeBytes2. */
  private[graft] def murmur3Stages(strCol: String,
      out: String): Seq[(String, String)] = {
    val bs = s"${out}_bs"; val bl = s"${out}_bl"
    val word = (0 until 4).map(j =>
      s"($bs[4*t + ${j + 1}]::HUGEINT) * ${1L << (8 * j)}")
      .mkString("(", " + ", ")")
    val step = mixH1Tail(xorS("h", mixK1("w")))
    val tailK1 = (0 until 3).map(j =>
      s"(CASE WHEN $bl - 4*${out}_n4 >= ${j + 1} THEN " +
        s"$bs[4*${out}_n4 + ${j + 1}]::HUGEINT * ${1L << (8 * j)} ELSE 0 END)")
      .mkString("(", " + ", ")")
    byteStages(strCol, out) ++ Seq(
      s"${out}_n4" -> s"($bl // 4)",
      s"${out}_hw" ->
        (s"list_reduce(list_concat([CAST(42 AS HUGEINT)], " +
          s"list_transform(generate_series(0, ${out}_n4 - 1), t -> $word)), " +
          s"(h, w) -> $step)"),
      s"${out}_k1" -> tailK1,
      // empty tail: mixK1(0) = 0 and xor(h, 0) = h — no CASE needed
      s"${out}_ht" -> xorS(s"${out}_hw", mixK1(s"${out}_k1")),
      s"${out}_x"  -> xorS(s"${out}_ht", bl),
      s"${out}_f1" -> mul32(xorS(s"${out}_x", shr(s"${out}_x", 16)), "2246822507"),
      s"${out}_f2" -> mul32(xorS(s"${out}_f1", shr(s"${out}_f1", 13)), "3266489909"),
      s"${out}_u"  -> xorS(s"${out}_f2", shr(s"${out}_f2", 16)))
  }

  /** Scala mirror of the same algorithm, used ONLY by the spec to pin
    * the formulation against ml.HashingTF.indexOf — never by the
    * pipeline (the pipeline runs MLlib; the oracle runs the SQL). */
  private[graft] def murmur3String(s: String, seed: Int = 42): Int = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n4 = bytes.length / 4
    def mixK1(k0: Int): Int = {
      var k = k0 * 0xcc9e2d51
      k = Integer.rotateLeft(k, 15); k * 0x1b873593
    }
    var h = seed
    var i = 0
    while (i < n4) {
      val w = (bytes(4 * i) & 0xFF) | ((bytes(4 * i + 1) & 0xFF) << 8) |
        ((bytes(4 * i + 2) & 0xFF) << 16) | ((bytes(4 * i + 3) & 0xFF) << 24)
      h ^= mixK1(w)
      h = Integer.rotateLeft(h, 13) * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0; var j = 4 * n4; var shift = 0
    while (j < bytes.length) {
      k1 ^= (bytes(j) & 0xFF) << shift; j += 1; shift += 8
    }
    h ^= mixK1(k1)
    h ^= bytes.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Full q_similarity_join_p2 replay: Extended.similarityJoinP2's
    * pinned shape (sample embedded, bigram shingles, HashingTF 4096,
    * 3 MinHash tables, exact-Jaccard similarity >= 0.5, canonical
    * a < b pairs emitted once). numFeatures = 4096 divides 2^32, so
    * Utils.nonNegativeMod(signedHash, 4096) == unsignedHash % 4096. */
  private[graft] def similarityJoinP2Sql(sampledIds: Seq[Long],
      coefs: Seq[(Int, Int)]): String = {
    require(coefs.nonEmpty && sampledIds.nonEmpty)
    val layers = murmur3Stages("shingle", "mh").map(Seq(_)) :+
      Seq("idx" -> s"CAST(mh_u % 4096 AS BIGINT)")
    val (vocCtes, vocLast) = layeredCte(
      "SELECT DISTINCT shingle FROM (SELECT unnest(sh_set) AS shingle FROM shd)",
      layers, "v0")
    val mins = coefs.zipWithIndex.map { case ((a, b), t) =>
      s"min(((1 + v.idx) * $a + $b) % 2038074743) AS m$t"
    }.mkString(", ")
    val anyTable = coefs.indices.map(t => s"a.m$t = b.m$t").mkString(" OR ")
    val ids = sampledIds.sorted.mkString(", ")
    val inter = "len(list_intersect(sa.iset, sb.iset))"
    val union = s"len(sa.iset) + len(sb.iset) - $inter"
    val sim = s"1.0 - (1.0 - (CAST($inter AS DOUBLE) / CAST($union AS DOUBLE)))"
    s"""WITH shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(string_split(text,' '))-1),
       |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh_set
       |  FROM documents
       |  WHERE doc_id IN ($ids) AND len(string_split(text,' ')) >= 2
       |), sh AS (
       |  SELECT doc_id, unnest(sh_set) AS shingle FROM shd
       |),
       |$vocCtes,
       |di AS (
       |  SELECT DISTINCT d.doc_id, v.idx FROM sh d JOIN $vocLast v USING (shingle)
       |), sets AS (
       |  SELECT doc_id, list_distinct(list(idx)) AS iset FROM di GROUP BY doc_id
       |), sig AS (
       |  SELECT v.doc_id, $mins FROM di v GROUP BY v.doc_id
       |), cand AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($anyTable)
       |)
       |SELECT cand.a_id, cand.b_id, $sim AS similarity
       |FROM cand JOIN sets sa ON sa.doc_id = cand.a_id
       |          JOIN sets sb ON sb.doc_id = cand.b_id
       |WHERE $sim >= 0.5
       |ORDER BY a_id, b_id""".stripMargin
  }
}
