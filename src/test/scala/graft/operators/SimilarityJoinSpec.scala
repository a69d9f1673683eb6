package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ml.TfIdf

class SimilarityJoinSpec extends SparkSpec {

  test("corrected LSH self-join: similarity semantics, no self-pairs, a<b") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (2L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (3L, "structured streaming uses watermarks for stateful aggregations"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    val (_, tf) = TfIdf.fitTransform(docs, "text", dim = 1024)
    val out = SimilarityJoin.selfJoin(tf, "id", "text_tf", threshold = 0.9,
      seed = 7L)
    val rows = out.collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L)))                    // identical docs
    assert(pairs.forall { case (a, b) => a < b })       // Q2: canonical
    assert(pairs.toSet.size === pairs.size)             // Q2: unique
    // Q1: similarity (not distance): identical docs → 1.0
    val s12 = rows.find(r => r.getLong(0) == 1L).get.getDouble(2)
    assert(s12 === 1.0)
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L || p._1 == 3L))
  }

  test("legacyDistanceFilter reproduces the reference's inverted filter (Q1)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")
    ).toDF("id", "text")
    val (_, tf) = TfIdf.fitTransform(docs, "text", dim = 256)
    // legacy keeps DISSIMILAR pairs (distance >= t) — the reference's bug
    val legacy = SimilarityJoin.selfJoin(tf, "id", "text_tf",
      threshold = 0.97, seed = 7L, legacyDistanceFilter = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!legacy.contains((1L, 2L)))   // identical pair excluded (!)
  }
}
