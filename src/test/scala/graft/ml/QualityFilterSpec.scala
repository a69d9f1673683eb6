package graft.ml

import graft.SparkSpec

/** The model-based quality filter: weak-label construction, learnable
  * fit (holdout accuracy floor), and non-degenerate behavior (both
  * classes present in labels AND predictions). */
class QualityFilterSpec extends SparkSpec {

  test("weak labels: both classes, rule recomputed driver-side") {
    val f = QualityFilter.featurize(spark, sf("sf0.001")).collect()
    assert(f.length === 500)
    val pos = f.count(_.getAs[Double]("label") == 1.0)
    assert(pos > 100 && pos < 450, s"degenerate label balance: $pos/500")
  }

  test("holdout confusion: accuracy floor, both classes predicted") {
    val cells = QualityFilter.confusion(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val total = cells.values.sum
    val correct = cells.getOrElse((0L, 0L), 0L) + cells.getOrElse((1L, 1L), 0L)
    assert(total > 50, s"holdout too small: $total")
    // the weak rule keys on token count, which is absent from the
    // features but correlated with chars/avg_token_len — a linear model
    // recovers most but not all of it (the n_tokens≥20 boundary is a
    // RATIO of the features, not linear in them). Measured 0.833 on the
    // seeded split; floor pinned at 0.78, well above the 0.636
    // majority-class rate
    val acc = correct.toDouble / total
    assert(acc >= 0.78, f"holdout accuracy $acc%.3f")
    val majority = math.max(
      cells.filter(_._1._1 == 0L).values.sum,
      cells.filter(_._1._1 == 1L).values.sum).toDouble / total
    assert(acc > majority, f"model no better than majority $majority%.3f")
    assert(cells.keys.map(_._2).toSet === Set(0L, 1L),
      "classifier collapsed to one class")
  }
}
