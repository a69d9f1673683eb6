package graft.queries

import graft.SparkSpec

/** Pins the hot-shingle document-frequency cap in ngramJaccardPairsOn:
  * shingles with df > maxDf leave the pairing universe entirely (both
  * intersection and union), and a high cap reproduces uncapped Jaccard.
  */
class TextAnalysisSpec extends SparkSpec {

  private def tokensFrame = {
    val spark2 = spark
    import spark2.implicits._
    // "a b" is the hot shingle: df = 12 (every doc). Docs 1 and 2 also
    // share the rare shingle "b c"; docs 3..12 share ONLY the hot one.
    val docs = Seq(
      (1L, "a b c x"),
      (2L, "a b c y")) ++ (3 to 12).map(i => (i.toLong, s"a b q$i"))
    docs.map { case (id, text) => (id, "en", text.split(" ").toSeq) }
      .toDF("doc_id", "lang", "t")
  }

  test("df cap drops hot shingles from intersection AND union") {
    val spark2 = spark
    import spark2.implicits._
    val capped = TextAnalysis
      .ngramJaccardPairsOn(tokensFrame, threshold = 0.01, maxDf = 5)
      .collect()
    // only the (1,2) pair survives: its rare universe is {"b c","c x"} vs
    // {"b c","c y"} → jaccard 1/3; docs 3..12 shared only "a b" → gone.
    assert(capped.length === 1)
    val row = capped.head
    assert((row.getLong(0), row.getLong(1)) === ((1L, 2L)))
    assert(math.abs(row.getDouble(3) - 1.0 / 3.0) < 1e-12)
  }

  test("cap above max df is a no-op (oracle-parity guarantee)") {
    val spark2 = spark
    import spark2.implicits._
    val uncapped = TextAnalysis
      .ngramJaccardPairsOn(tokensFrame, threshold = 0.01, maxDf = 1000)
    // (1,2) now includes "a b": {"a b","b c","c x"} ∩ {"a b","b c","c y"}
    // = 2, union 4 → 0.5; the hot-only pairs (3..12 choose 2 = 45 pairs
    // plus hot pairs with 1,2) reappear.
    val r12 = uncapped.filter($"a_id" === 1L && $"b_id" === 2L).collect()
    assert(r12.length === 1)
    assert(math.abs(r12.head.getDouble(3) - 0.5) < 1e-12)
    assert(uncapped.count() === (12L * 11L) / 2L) // every pair shares "a b"
  }
}
