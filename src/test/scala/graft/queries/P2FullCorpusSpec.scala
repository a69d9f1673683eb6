package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closes the reference's p2 infeasibility story on the native path.
  *
  * The reference pins p2 to <= 0.2 of the corpus on one machine
  * (Predictor.scala:26-28, paper §1.1) because MLlib's
  * approxSimilarityJoin exact-verifies EVERY bucket-colliding candidate —
  * quadratic in hot buckets. Our MLlib-fidelity query
  * (q_similarity_join_p2) already runs 2.5x the reference's feasible
  * fraction; this spec proves the graft-native banding operator needs no
  * sampling at all: fraction 1.0 over the corpus, completing well inside
  * a wall bound, and covering every pair the sampled MLlib path finds.
  */
class P2FullCorpusSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("native banding at fraction 1.0 completes and covers the sampled MLlib result") {
    val spark2 = spark
    import spark2.implicits._
    val t0 = System.nanoTime()
    // full corpus — no .sample anywhere in this path
    val full = Extended.minhashNearDup(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wallSec = (System.nanoTime() - t0) / 1e9
    // bound far above nominal (~5 s) but far below "does not complete":
    // host timings swing ~10x, so the gate is completion-in-minutes vs a
    // quadratic bucket verify that runs out of memory or hours
    assert(wallSec < 600.0, s"full-corpus banding took $wallSec s")
    assert(full.nonEmpty)

    val sampled = Extended.similarityJoinP2(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled.nonEmpty, "MLlib sample found no pairs — corpus changed?")
    val missed = sampled -- full
    assert(missed.isEmpty,
      s"full-corpus banding missed ${missed.size}/${sampled.size} " +
        s"MLlib-sample pairs: ${missed.take(5).mkString(", ")}")
  }
}
