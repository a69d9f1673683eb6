package graft.queries

import graft.SparkSpec
import graft.sources.Tables

/** Embedding aggregation: centroids against a driver-side recomputation.
  * Since r14 the query accumulates EXACTLY in fixed point (2^63-scaled
  * integer sum, one terminal rounding) and is hash-checked by a DuckDB
  * oracle; this spec keeps the independent check that the exact mean
  * stays within float tolerance of a naive driver-side float mean. */
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
    // query emits one (label, dim, m, n_vecs) row per dimension
    val rows = Embeddings.centroids(spark, sf("sf0.001")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toList
    // ordered by (label, dim)
    assert(rows.map(r => (r._1, r._2)) ===
      rows.map(r => (r._1, r._2)).sorted)
    val byLabel = rows.groupBy(_._1)
    assert(byLabel.keySet === want.keySet)
    for ((label, dimRows) <- byLabel) {
      val w = want(label)
      assert(dimRows.size === w.size)
      for ((_, dim, m, nVecs) <- dimRows) {
        assert(nVecs === raw.count(_._1 == label).toLong)
        assert(math.abs(m - w(dim)) < 1e-9, s"label $label dim $dim")
      }
    }
  }
}
