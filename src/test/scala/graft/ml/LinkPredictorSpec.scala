package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end p1 (reference Predictor.scala:350-380) on a deterministic
  * in-memory fixture: two "topic clusters" of papers; real links connect
  * same-cluster papers. The trained model must separate same-cluster from
  * cross-cluster candidate pairs (F1 well above chance at best threshold).
  */
class LinkPredictorSpec extends SparkSpec {

  private val t1 = "quantum gravity entanglement duality holographic boundary"
  private val t2 = "supersymmetry breaking gauge mediation soft terms"

  private def nodes = {
    val spark2 = spark
    import spark2.implicits._
    (0 until 20).map { i =>
      val c = i % 2
      val words = if (c == 0) t1 else t2
      (s"p$i", (1993 + i % 10).toString, s"paper $i on ${words.split(" ").take(2).mkString(" ")}",
        s"author${i % 3},author${3 + i % 4}", if (c == 0) "JHEP" else "PRL",
        s"$words study ${i}")
    }.toDF("id", "year", "title", "authors", "journal", "abstract")
  }

  private def pairsOf(ids: Seq[(Int, Int)]) = {
    val spark2 = spark
    import spark2.implicits._
    ids.map { case (a, b) => (s"p$a", s"p$b") }.toDF("srcId", "dstId")
  }

  test("p1 end-to-end: trains, scores, same-cluster pairs rank higher") {
    val spark2 = spark
    import spark2.implicits._
    // train edges: same-cluster = 1, cross-cluster = 0
    val trainPos = (0 until 8).map(i => (i, i + 2))            // same parity
    val trainNeg = (0 until 8).map(i => (i, i + 1))            // cross parity
    val train = pairsOf(trainPos).withColumn("label", lit(1))
      .union(pairsOf(trainNeg).withColumn("label", lit(0)))
    // candidates: 4 same-cluster (true links), 4 cross (non-links)
    val cand = pairsOf(Seq((10, 12), (11, 13), (12, 14), (13, 15),
      (10, 11), (11, 12), (12, 13), (13, 14)))
    val gt = pairsOf(Seq((10, 12), (11, 13), (12, 14), (13, 15)))
    val (model, scored, metrics) = LinkPredictor.run(
      spark, nodes, train, cand, gt, maxIter = 50)
    assert(model.coefficients.size === LinkPredictor.featureCols.length)
    val rows = scored.select($"srcId", $"label", $"p1").collect()
    assert(rows.length === 8)
    val bestF1 = metrics.agg(max($"f1")).head.getDouble(0)
    assert(bestF1 === 1.0)  // clusters are linearly separable by features
  }

  test("sweepMetrics on hard 0/1 predictions reproduces the degenerate " +
      "two-point sweep (reference Q4)") {
    val spark2 = spark
    import spark2.implicits._
    val scored = Seq((1.0, 1), (1.0, 1), (0.0, 0), (0.0, 1))
      .toDF("prediction", "label")
    val m = LinkPredictor.sweepMetrics(scored, "prediction").collect()
    assert(m.length === 2)                       // thresholds {1.0, 0.0}
    val at1 = m.find(_.getDouble(0) == 1.0).get
    assert(at1.getDouble(1) === 1.0)             // precision at threshold 1
    assert(at1.getDouble(2) === 2.0 / 3.0)       // recall 2 of 3 positives
  }
}
