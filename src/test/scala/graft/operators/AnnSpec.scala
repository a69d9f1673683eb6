package graft.operators

import graft.SparkSpec

class AnnSpec extends SparkSpec {

  private def corpus = {
    val spark2 = spark
    import spark2.implicits._
    // 3 clusters along axes + one duplicate of id 0
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Array(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
  }

  test("bruteTopK: exact neighbors, ranked by cosine desc") {
    val spark2 = spark
    import spark2.implicits._
    val q = corpus.filter($"id" === 0L)
    val out = Ann.bruteTopK(corpus, q, k = 2)
      .orderBy($"rank").collect()
    // nearest to e0: its duplicate (5, cos=1), then 1
    assert(out(0).getLong(1) === 5L)
    assert(out(0).getDouble(2) === 1.0)
    assert(out(1).getLong(1) === 1L)
  }

  test("lshTopK finds the exact duplicate (same bucket in every table)") {
    val spark2 = spark
    import spark2.implicits._
    val q = corpus.filter($"id" === 0L)
    val out = Ann.lshTopK(corpus, q, k = 3, nTables = 4, nBits = 4)
      .collect()
    val ids = out.map(_.getLong(1)).toSet
    assert(ids.contains(5L))  // identical vector always collides
    assert(out.forall(_.getLong(0) == 0L))
  }

  test("signature is deterministic and identical for identical vectors") {
    val spark2 = spark
    import spark2.implicits._
    val sigs = corpus.select($"id",
        Ann.signature(
          org.apache.spark.sql.functions.transform($"vec", _.cast("double")),
          table = 0, nBits = 8, dim = 4, seed = 42).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) === sigs(5L))
  }
}
