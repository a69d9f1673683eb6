package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bottom-k sampling aggregate: exactness below k, uniform subset above,
  * and the property that justifies it over a reservoir — invariance to
  * partitioning (the distributed merge is exact). */
class SketchAggsSpec extends SparkSpec {

  private def sampleOf(values: Seq[Long], k: Int, seed: Long,
      partitions: Int): Seq[Long] = {
    val spark2 = spark
    import spark2.implicits._
    values.toDF("v").repartition(partitions)
      .agg(SketchAggs.bottomKSample($"v", k, seed).as("s"))
      .collect().head.getSeq[Long](0)
  }

  test("groups with ≤ k distinct values are returned exactly") {
    assert(sampleOf(Seq(5L, 3L, 9L, 3L, 5L), k = 5, seed = 1L, 3) ===
      Seq(3L, 5L, 9L))
    assert(sampleOf(Seq.empty, k = 5, seed = 1L, 1) === Seq.empty)
  }

  test("samples are subsets of the input with size k, distinct-unique") {
    val values = (1L to 500L) ++ (1L to 500L) // duplicates collapse
    val s = sampleOf(values, k = 7, seed = 2L, 4)
    assert(s.size === 7)
    assert(s.distinct.size === 7)
    assert(s.forall(v => v >= 1 && v <= 500))
  }

  test("result is invariant to partitioning (exact distributed merge)") {
    val values = (1L to 2000L).map(i => i * 13 % 997)
    val one = sampleOf(values, k = 10, seed = 3L, partitions = 1)
    val many = sampleOf(values, k = 10, seed = 3L, partitions = 13)
    assert(one === many)
  }

  test("different seeds draw different samples; same seed reproduces") {
    val values = (1L to 1000L).toSeq
    val a = sampleOf(values, k = 10, seed = 4L, 4)
    val b = sampleOf(values, k = 10, seed = 5L, 4)
    assert(a === sampleOf(values, k = 10, seed = 4L, 4))
    assert(a !== b)
  }

  test("int columns widen implicitly; non-numeric types fail analysis") {
    graft.plans.GraftExtensions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    Seq(3, 1, 2).toDF("v").createOrReplaceTempView("bks_int")
    // INT child: ImplicitCastInputTypes widens to long instead of a
    // runtime ClassCastException
    val got = spark.sql("SELECT bottom_k_sample(v, 5, 1) FROM bks_int")
      .head().getSeq[Long](0)
    assert(got === Seq(1L, 2L, 3L))
    // non-castable child (array): rejected at analysis time, not at
    // task runtime (strings implicitly cast like any numeric agg and
    // fail per-value at runtime — standard Spark semantics)
    Seq(Seq(1L)).toDF("a").createOrReplaceTempView("bks_arr")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bottom_k_sample(a, 5, 1) FROM bks_arr").collect()
    }
  }

  test("out-of-range k literal errors instead of silently wrapping") {
    graft.plans.GraftExtensions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    Seq(3L, 1L, 2L).toDF("v").createOrReplaceTempView("bks_range")
    // 4294967298 = 2^32 + 2: a bare .toInt would make this k = 2
    val e = intercept[Throwable] {
      spark.sql("SELECT bottom_k_sample(v, 4294967298, 1) FROM bks_range")
        .collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("k must be in [1,"))
    intercept[Throwable] {
      spark.sql("SELECT bottom_k_sample(v, 0, 1) FROM bks_range").collect()
    }
  }

  test("per-group sampling via groupBy, null inputs skipped") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(9L))).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(SketchAggs.bottomKSample($"v", 5, 1L).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(1L, 2L))
    assert(got("b") === Seq(9L))
  }

  test("sampling is roughly uniform over many seeds") {
    // 100 seeds × k=10 over values 0..99: each value should be drawn
    // ~10 times; a badly skewed hash would concentrate mass
    val values = (0L until 100L).toSeq
    val counts = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    for (seed <- 0 until 100)
      sampleOf(values, k = 10, seed = seed.toLong, 2)
        .foreach(v => counts(v) += 1)
    val drawn = counts.values.sum
    assert(drawn === 1000)
    assert(counts.values.max <= 30, s"hot value drawn ${counts.values.max}x")
  }

  // --- FrequentItems (Misra–Gries) ---

  private def freqOf(values: Seq[String], capacity: Int,
      partitions: Int): Seq[(String, Long, Long)] = {
    val spark2 = spark
    import spark2.implicits._
    values.toDF("v").repartition(partitions)
      .agg(SketchAggs.frequentItems($"v", capacity).as("f"))
      .select(explode($"f").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("freq items: exact when distinct values fit the capacity") {
    val values = Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    for (parts <- Seq(1, 3, 8)) {
      val got = freqOf(values, capacity = 8, partitions = parts)
      assert(got.map(t => (t._1, t._2)) === Seq(("x", 7L), ("y", 3L), ("z", 1L)),
        s"parts=$parts")
      assert(got.forall(_._3 === 0L), s"parts=$parts err must be 0")
    }
  }

  test("freq items: MG contract holds under any partitioning") {
    // dominant head + zipf tail: w01 appears 2048 times, item i > 1
    // ceil(512/i) times → n ≈ 3963, so est(w01) ≥ 2048 − err clears any
    // other item's true count even at the worst-case error bound
    val values = (1 to 64).flatMap(i =>
      Seq.fill(if (i == 1) 2048 else (512 + i - 1) / i)(f"w$i%02d"))
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = freqOf(values, capacity = 12, partitions = parts)
      assert(got.nonEmpty && got.size <= 12, s"parts=$parts")
      val err = got.head._3
      got.foreach { case (item, est, e) =>
        assert(e === err, s"parts=$parts err must be group-uniform")
        assert(est >= 1 && est <= exact(item), s"parts=$parts $item")
        assert(exact(item) <= est + err, s"parts=$parts $item")
      }
      // completeness: anything with true count > err must be present
      val present = got.map(_._1).toSet
      exact.foreach { case (item, n) =>
        if (n > err) assert(present(item), s"parts=$parts missing $item ($n > $err)")
      }
      // a >50%-mass item clears any achievable error bound → always top-1
      assert(got.head._1 === "w01", s"parts=$parts")
    }
  }

  test("freq items: the per-partition update fold is arrival-order-" +
    "DEPENDENT — the executable reason q_frequent_words has no replay " +
    "oracle (both orders honor the est ≤ true ≤ est+err contract)") {
    // capacity 1, multiset {a,a,c,d}: streamed a,a,c,d the summary is
    // {} with err 2; streamed c,d,a,a it is {a:2} with err 1. A pure
    // function of the multiset cannot produce both, so any DuckDB
    // replay would have to simulate Spark's scan-split boundaries and
    // in-file row order — session config, not table content.
    def fold(order: Seq[String]): Seq[(String, Long, Long)] = {
      val spark2 = spark
      import spark2.implicits._
      // ONE partition in the given order: parallelize(…, 1) feeds the
      // partial aggregate's update fold exactly this arrival sequence
      spark2.sparkContext.parallelize(order, 1).toDF("v")
        .agg(SketchAggs.frequentItems($"v", 1).as("f"))
        .select(explode($"f").as("e"))
        .select($"e.item", $"e.est", $"e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
    }
    assert(fold(Seq("a", "a", "c", "d")) === Seq.empty)
    assert(fold(Seq("c", "d", "a", "a")) === Seq(("a", 2L, 1L)))
  }

  test("freq items: SQL registration and capacity validation") {
    val spark2 = spark
    import spark2.implicits._
    graft.plans.GraftExtensions.register(spark)
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("fi_sql")
    val got = spark.sql(
      "SELECT mg_freq_items(v, 4) AS f FROM fi_sql")
      .select(explode($"f").as("e")).select($"e.item", $"e.est")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("a", 2L), ("b", 1L)))
    intercept[Throwable] {
      spark.sql("SELECT mg_freq_items(v, 0) FROM fi_sql").collect()
    }
    intercept[Throwable] {
      spark.sql(s"SELECT mg_freq_items(v, ${4294967298L}) FROM fi_sql")
        .collect()
    }
  }

  test("freq items: nulls skipped, per-group via groupBy") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("g1", Some("a")), ("g1", Some("a")), ("g1", None),
      ("g2", Some("z"))).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(SketchAggs.frequentItems($"v", 4).as("f"))
      .select($"g", explode($"f").as("e"))
      .select($"g", $"e.item", $"e.est")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(("g1", "a", 2L), ("g2", "z", 1L)))
  }

  private def cmCorpus = {
    val spark2 = spark
    import spark2.implicits._
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
  }

  private def cmRun(df: org.apache.spark.sql.DataFrame,
      probes: Seq[String], widthLog2: Int = 10): Map[String, Long] = {
    val spark2 = spark
    import spark2.implicits._
    df.agg(SketchAggs.cmEstimate($"w", probes, widthLog2 = widthLog2)
        .as("ests"))
      .select(org.apache.spark.sql.functions.explode($"ests").as("e"))
      .select($"e.item", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("count-min: est ≥ true on the real corpus; overcount bounded") {
    val spark2 = spark
    import spark2.implicits._
    val probes = Seq("the", "table", "data", "zzz_absent")
    val words = cmCorpus.cache()
    val n = words.count()
    val exact = words.filter($"w".isInCollection(probes))
      .groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = cmRun(words, probes)
    probes.foreach { p =>
      val t = exact.getOrElse(p, 0L)
      assert(est(p) >= t, s"$p: est ${est(p)} < true $t")
      // ε = e/width bound, depth 4 → overwhelmingly held; deterministic
      // seed so this is a pin, not a flake
      assert(est(p) - t <= 3 * n / 1024, s"$p overcount ${est(p) - t}")
    }
    words.unpersist(blocking = false)
  }

  test("count-min: bit-identical under 1/3/8 partitions (exact sum merge)") {
    val probes = Seq("the", "table", "spark", "value")
    val base = cmCorpus
    val runs = Seq(1, 3, 8).map(p => cmRun(base.repartition(p), probes))
    assert(runs.distinct.length === 1,
      "CM estimates must not depend on partitioning")
  }

  test("count-min: exact when the width dwarfs the vocabulary; empty " +
    "input estimates zero") {
    val spark2 = spark
    import spark2.implicits._
    val tiny = Seq("a", "a", "b", "a", "c").toDF("w")
    val est = cmRun(tiny, Seq("a", "b", "c", "d"), widthLog2 = 16)
    assert(est === Map("a" -> 3L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
    val empty = cmRun(Seq.empty[String].toDF("w"), Seq("a"))
    assert(est("d") === 0L && empty === Map("a" -> 0L))
  }

  // ---- HLL distinct ----

  private def hllRun(values: Seq[Long], partitions: Int,
      p: Int = 8): (Double, Long) = {
    val spark2 = spark
    import spark2.implicits._
    val r = values.toDF("v").repartition(partitions)
      .agg(SketchAggs.hllDistinct($"v", p, 42L).as("h"))
      .select($"h.est", $"h.n_zero").head()
    (r.getDouble(0), r.getLong(1))
  }

  test("hll: raw estimator lands within the 1.04/√m band of the truth") {
    // n = 5000 distinct ≫ 2.5m = 640, the raw estimator's sound regime;
    // σ = 1.04/16 ≈ 6.5% — assert a 3σ envelope (the draw is seeded,
    // so this is a deterministic pin, not a flaky statistical test)
    val (est, nZero) = hllRun((1L to 5000L), partitions = 4)
    assert(math.abs(est / 5000.0 - 1.0) < 0.2, s"est=$est")
    assert(nZero === 0L, "5000 draws into 256 registers leave none empty")
  }

  test("hll: duplicates are invisible (set semantics) and the merged " +
    "sketch is bit-identical under 1/3/8 partitions") {
    val base = (1L to 2000L).map(i => i * 31 % 4999)
    val withDups = base ++ base ++ base.take(500)
    val runs = Seq(1, 3, 8).map(p => hllRun(withDups, p))
    assert(runs.distinct.length === 1,
      "register max-merge must not depend on partitioning")
    assert(hllRun(base.distinct, 2) === runs.head,
      "HLL is a pure function of the value SET")
  }

  test("hll: empty input → every register zero, estimate is α·m (all " +
    "terms 1.0); nulls skipped") {
    val spark2 = spark
    import spark2.implicits._
    val (est, nZero) = hllRun(Seq.empty, 1)
    assert(nZero === 256L)
    assert(math.abs(est - SketchAggs.hllAlpha(256) * 256) < 1e-9)
    val r = Seq[Option[Long]](Some(7L), None, Some(7L)).toDF("v")
      .agg(SketchAggs.hllDistinct($"v", 8, 42L).as("h"))
      .select($"h.n_zero").head().getLong(0)
    assert(r === 255L, "one distinct non-null value → one register set")
  }

  test("hll state path: store shards → merge → score is bit-identical " +
    "to the one-pass sketch, registers included") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (1L to 3000L).map(i => (i % 7, i * 13 % 997))
    val df = rows.toDF("g", "v").repartition(5)
    // one-pass reference
    val direct = df.groupBy($"g")
      .agg(SketchAggs.hllDistinct($"v", 8, 42L).as("h"))
      .select($"g", $"h.est", $"h.n_zero")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    // store-merge-score with an arbitrary sharding
    val viaState = df.withColumn("shard", pmod($"v", lit(3L)))
      .groupBy($"g", $"shard")
      .agg(SketchAggs.hllRegisters($"v", 8, 42L).as("st"))
      .groupBy($"g")
      .agg(SketchAggs.hllMerge($"st", 8).as("st"))
      .select($"g", SketchAggs.hllEstimate($"st").as("h"))
      .select($"g", $"h.est", $"h.n_zero")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaState === direct)
    // and the raw register arrays agree with the distinct-set sketch
    val regsMerged = df.withColumn("shard", pmod($"v", lit(2L)))
      .groupBy($"g", $"shard")
      .agg(SketchAggs.hllRegisters($"v", 8, 42L).as("st"))
      .groupBy($"g")
      .agg(SketchAggs.hllMerge($"st", 8).as("st"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val regsDirect = df.groupBy($"g")
      .agg(SketchAggs.hllRegisters($"v", 8, 42L).as("st"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    regsDirect.foreach { case (g, st) =>
      assert(java.util.Arrays.equals(st, regsMerged(g)),
        s"group $g register state diverged")
    }
    // precision mismatch fails loudly, not silently
    val bad = intercept[Exception] {
      df.groupBy($"g")
        .agg(SketchAggs.hllRegisters($"v", 8, 42L).as("st"))
        .agg(SketchAggs.hllMerge($"st", 9).as("m"))
        .collect()
    }
    assert(bad.getMessage != null)
  }

  // ---- bottom-k row-sample pairs ----

  private def pairsRun(rows: Seq[(Long, Double)], k: Int,
      partitions: Int): Seq[Double] = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("k", "v").repartition(partitions)
      .agg(SketchAggs.bottomKPairs($"k", $"v", k, 42L).as("s"))
      .collect().head.getSeq[Double](0)
  }

  test("bottomKPairs: groups with ≤ k rows return every value, sorted") {
    val rows = Seq((1L, 5.0), (2L, 1.0), (3L, 9.0))
    assert(pairsRun(rows, k = 5, 2) === Seq(1.0, 5.0, 9.0))
    assert(pairsRun(Seq.empty, k = 5, 1) === Seq.empty)
  }

  test("bottomKPairs: k-subset of the input values, bit-identical under " +
    "1/3/8 partitions") {
    val rows = (1L to 3000L).map(i => (i, (i * 17 % 101).toDouble))
    val runs = Seq(1, 3, 8).map(p => pairsRun(rows, k = 25, p))
    assert(runs.distinct.length === 1,
      "key-hash sample must not depend on partitioning")
    assert(runs.head.size === 25)
    assert(runs.head === runs.head.sorted)
    val vals = rows.map(_._2).toSet
    assert(runs.head.forall(vals.contains))
  }

  test("bottomKPairs: the sampled ROW set is a pure function of the key " +
    "set — value payloads don't steer inclusion") {
    // same keys, shifted values: the same ranks are selected, so the
    // emitted values are exactly the shifted ones
    val keys = (1L to 400L)
    val a = pairsRun(keys.map(k => (k, k.toDouble)), k = 10, 3)
    val b = pairsRun(keys.map(k => (k, k.toDouble + 0.5)), k = 10, 3)
    assert(b === a.map(_ + 0.5))
  }

  test("bottomKPairs: a unique-key-contract violation fails LOUDLY " +
    "(same key, differing values) instead of silently overwriting") {
    // k large enough that the twin is resident when its duplicate lands
    val dup = Seq((7L, 1.0), (7L, 2.0)) ++ (100L to 110L).map(i => (i, 0.0))
    val ex = intercept[org.apache.spark.SparkException] {
      pairsRun(dup, k = 50, 1)
    }
    assert(ex.getMessage.contains("uniquely identify") ||
      Option(ex.getCause).exists(_.getMessage.contains("uniquely identify")))
    // same-value re-arrival (retry/idempotent merge) stays legal
    assert(pairsRun(Seq((7L, 1.0), (7L, 1.0), (8L, 2.0)), k = 5, 2)
      === Seq(1.0, 2.0))
  }

  test("bottomKPairs: same-NaN re-arrival is same-value, not a " +
    "violation (ADVICE r15: IEEE != calls every NaN a mismatch, which " +
    "would fail legal task retries), while NaN-vs-number still fails") {
    val out = pairsRun(
      Seq((7L, Double.NaN), (7L, Double.NaN), (8L, 2.0)), k = 5, 2)
    assert(out.length === 2)
    assert(out.exists(_.isNaN) && out.contains(2.0))
    val ex = intercept[org.apache.spark.SparkException] {
      pairsRun(Seq((7L, Double.NaN), (7L, 1.0)) ++
        (100L to 110L).map(i => (i, 0.0)), k = 50, 1)
    }
    assert(ex.getMessage.contains("uniquely identify") ||
      Option(ex.getCause).exists(_.getMessage.contains("uniquely identify")))
  }

  test("bottomKPairs: ±0.0 re-arrival is same-value, not a violation " +
    "(ADVICE r16: a task retry's recomputed order-dependent float sum " +
    "can legitimately flip zero sign; canonicalize before bit compare)") {
    val out = pairsRun(Seq((7L, 0.0), (7L, -0.0), (8L, 2.0)), k = 5, 2)
    assert(out.length === 2)
    assert(out.contains(0.0) && out.contains(2.0))
    // the reverse arrival order too (-0.0 resident, +0.0 re-arrives)
    assert(pairsRun(Seq((7L, -0.0), (7L, 0.0), (8L, 2.0)), k = 5, 2)
      .length === 2)
  }
}
