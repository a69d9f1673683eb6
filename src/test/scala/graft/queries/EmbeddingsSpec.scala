package graft.queries

import graft.SparkSpec
import graft.sources.Tables

/** Embedding aggregation: centroids against a driver-side recomputation
  * (float means are order-dependent in the last ulp, hence spec + tolerance
  * rather than a SQL oracle). */
class EmbeddingsSpec extends SparkSpec {

  test("centroids match a local elementwise mean at sf0.001") {
    val spark2 = spark
    import spark2.implicits._
    val raw = Tables.embeddings(spark, sf("sf0.001"))
      .select($"label", $"embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble))
    val want = raw.groupBy(_._1).map { case (label, rows) =>
      val vecs = rows.map(_._2)
      val dims = vecs.head.size
      label -> (0 until dims).map(d => vecs.map(_(d)).sum / vecs.size)
    }
    val got = Embeddings.centroids(spark, sf("sf0.001")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1), r.getLong(2))).toList
    assert(got.map(_._1) === got.map(_._1).sorted)
    for ((label, centroid, nVecs) <- got) {
      assert(nVecs === raw.count(_._1 == label).toLong)
      val w = want(label)
      assert(centroid.size === w.size)
      centroid.zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label")
      }
    }
  }
}
