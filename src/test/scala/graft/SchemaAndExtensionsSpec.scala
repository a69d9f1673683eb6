package graft

class SchemaAndExtensionsSpec extends SparkSpec {

  test("typed Datasets: documents/events/embeddings round-trip the schema") {
    val docs = schema.documents(spark, sf("sf0.001"))
    val d = docs.head()
    assert(d.text.nonEmpty && d.n_chars > 0)
    val ev = schema.events(spark, sf("sf0.001")).head()
    assert(ev.ts != null && ev.props.startsWith("{"))
    val em = schema.embeddings(spark, sf("sf0.001")).head()
    assert(em.embedding.length === 64)
    // typed filter + map compiles and runs through Catalyst
    import docs.sparkSession.implicits._
    val n = docs.filter(_.lang == "en").map(_.n_chars).reduce(_ + _)
    assert(n > 0)
  }

  test("dot_product callable from SQL after runtime registration") {
    graft.plans.GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(v === 11.0)
    // float arrays coerce through the Cast in the builder
    val f = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(f === 3.0)
  }

  test("bottom_k_sample callable from SQL as a grouped aggregate") {
    graft.plans.GraftExtensions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    Seq(("a", 1L), ("a", 2L), ("b", 9L), ("b", 8L), ("b", 7L))
      .toDF("g", "v").createOrReplaceTempView("bks_in")
    val got = spark.sql(
      "SELECT g, bottom_k_sample(v, 2, 42) AS s FROM bks_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(1L, 2L))
    assert(got("b").size === 2 && got("b").forall(Seq(7L, 8L, 9L).contains))
    // same draw as the Column API
    val col = Seq(9L, 8L, 7L).toDF("v")
      .agg(graft.functions.SketchAggs.bottomKSample($"v", 2, 42L))
      .head().getSeq[Long](0)
    assert(got("b") === col)
  }
}
