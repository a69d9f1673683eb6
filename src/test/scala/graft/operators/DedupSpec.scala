package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),  // dup of 1
      (3L, "the quick brown fox jumps over the lazy cat again and again"),  // near-dup of 1
      (4L, "completely different content about spark catalyst optimizer internals"),
      (5L, "another unrelated text mentioning streaming watermarks and state")
    ).toDF("id", "text").withColumn("tokens", split($"text", " "))
  }

  test("exact dedup keeps lowest tie-break per key") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    val out = Dedup.exact(df, Seq("k"), "id").orderBy($"id")
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L, 3L))
  }

  test("minhashNearDup finds exact+near dups, skips unrelated, a<b once") {
    val spark2 = spark
    import spark2.implicits._
    val out = Dedup.minhashNearDup(docs, "id", "tokens",
      shingleN = 2, k = 32, bands = 16, threshold = 0.5)
      .orderBy($"a_id", $"b_id").collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L)))              // exact dup always caught
    assert(pairs.forall { case (a, b) => a < b }) // canonical orientation
    assert(pairs.toSet.size === pairs.size)       // each pair once
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L))
    val j12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    assert(j12 === 1.0)                           // identical shingle sets
  }

  test("minhashNearDup maxBucket guard drops degenerate buckets, keeps the rest") {
    val spark2 = spark
    import spark2.implicits._
    // 40 identical docs (one degenerate bucket in every band) + one
    // small near-dup pair that must survive the guard
    val degenerate = (100L until 140L)
      .map(i => (i, "same same same same same same same same"))
    val pair = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"))
    val df = (degenerate ++ pair).toDF("id", "text")
      .withColumn("tokens", split($"text", " "))
    val out = Dedup.minhashNearDup(df, "id", "tokens",
        shingleN = 2, k = 32, bands = 16, threshold = 0.5, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 40-doc bucket exceeds maxBucket=10 → its C(40,2) pairs are cut
    assert(!out.exists(p => p._1 >= 100L || p._2 >= 100L))
    // the small pair's bucket is untouched
    assert(out === Set((1L, 2L)))
  }

  test("keepRepresentatives removes all but min-id per transitive cluster") {
    val spark2 = spark
    import spark2.implicits._
    // pairs 1-2 and 2-3 chain into one cluster {1,2,3}; 4,5 untouched
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val kept = Dedup.keepRepresentatives(docs, pairs, "id")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 4L, 5L))
  }

  test("keepBestFromComponents keeps the argmax-score member, ties to min id") {
    val spark2 = spark
    import spark2.implicits._
    // cluster {1,2,3}: 2 has the best score → keep 2; 4,5 never paired
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val comps = graft.operators.Graph.connectedComponents(pairs)
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.2))
      .toDF("id", "score")
    val kept = Dedup.keepBestFromComponents(docs, comps, "id", scores)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    // 2 and 3 tie at 0.9 → the lower id (2) wins
    assert(kept === Seq(2L, 4L, 5L))
  }

  test("minhash signature is deterministic across evaluations") {
    val a = docs.select(Dedup.minhashSignature(col("tokens"), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    val b = docs.select(Dedup.minhashSignature(col("tokens"), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(a.toSeq === b.toSeq)
  }

  test("simhash: identical docs hash identically; hamming 0") {
    val spark2 = spark
    import spark2.implicits._
    val fp = docs.select($"id", Dedup.simhash($"tokens").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 12) // near-dup is close
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(4L)) > 12)  // unrelated is far
  }

  test("simhashNearDup maxBucket guard drops degenerate buckets, keeps the rest") {
    val spark2 = spark
    import spark2.implicits._
    // 40 identical docs → identical 64-bit fingerprints → one degenerate
    // bucket in every sub-band; plus one exact-dup pair (identical
    // fingerprints → guaranteed band collision) that must survive the
    // guard (same regression shape as the minhash test above)
    val degenerate = (100L until 140L)
      .map(i => (i, "same same same same same same same same"))
    val pair = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = (degenerate ++ pair).toDF("id", "text")
      .withColumn("tokens", split($"text", " "))
    val out = Dedup.simhashNearDup(df, "id", "tokens",
        maxHamming = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 40-doc buckets exceed maxBucket=10 → their C(40,2) pairs are cut
    assert(!out.exists(p => p._1 >= 100L || p._2 >= 100L))
    // the small pair's buckets are untouched
    assert(out === Set((1L, 2L)))
  }

  test("simhashNearDup: dup pair via banding, canonical + unique") {
    val spark2 = spark
    import spark2.implicits._
    val out = Dedup.simhashNearDup(docs, "id", "tokens", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.contains((1L, 2L)))
    assert(out.forall { case (a, b) => a < b })
    assert(out.toSet.size === out.size)
  }

  test("fused simhash ≡ the 64-pass HOF witness bit-for-bit (r17 kernel " +
      "parity): real-ish docs, empty array (-1L), null element, single " +
      "token, and the interpreted eval path") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "", "λ-unicode", "x")
    val organic = (0L until 300L).map { id =>
      (id, Seq.fill(1 + rng.nextInt(40))(words(rng.nextInt(words.size))))
    }
    val df = organic.toDF("id", "tokens")
    val both = df.select($"id",
        Dedup.simhash($"tokens").as("fused"),
        Dedup.simhashHof($"tokens").as("hof"))
      .collect()
    assert(both.forall(r => r.getLong(1) == r.getLong(2)),
      "fused != HOF on organic docs")
    // edge fixtures through expressions (null element needs SQL arrays)
    val edges = spark2.sql(
      """SELECT * FROM VALUES
        |  (1L, array()), (2L, array('only')),
        |  (3L, array('a', CAST(NULL AS STRING), 'b'))
        |  AS t(id, tokens)""".stripMargin)
    val e = edges.select($"id", Dedup.simhash($"tokens").as("fused"),
        Dedup.simhashHof($"tokens").as("hof"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(e(1L)._1 === -1L, "empty token array must fingerprint to -1L")
    assert(e.values.forall(p => p._1 == p._2), s"edge parity broke: $e")
    // interpreted (non-codegen) eval path parity: drive the expression's
    // eval() directly on the same docs and compare to the codegen result
    val codegen = both.map(r => r.getLong(0) -> r.getLong(1)).toMap
    organic.take(50).foreach { case (id, toks) =>
      val expr = graft.functions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          toks, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
      assert(expr.eval(null) === codegen(id),
        s"interpreted eval diverged from codegen for id=$id")
    }
  }
}
