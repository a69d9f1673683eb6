package graft

/** The xxhash64-replay oracle device (r14): the only Scala-EVALUATED
  * piece of the replay is the per-index XXH64 seed chain constant
  * (everything else is SQL text DuckDB executes, gated by the driver's
  * bit-compare at sf0.01) — pin those constants against Spark's own
  * xxhash64 so a primes/rotation typo can never ship a structurally
  * plausible but wrong oracle. */
class XxhReplaySqlSpec extends SparkSpec {

  test("Scala-evaluated XXH64 int-mix constants match Spark's xxhash64") {
    val exprs = (0 until 32).map(j => s"xxhash64($j) AS h$j").mkString(", ")
    val row = spark.sql(s"SELECT $exprs").head()
    for (j <- 0 until 32)
      assert(row.getLong(j) === XxhReplaySql.hashIntConst(j), s"j=$j")
  }

  test("Scala-evaluated XXH64 long fast path matches Spark's xxhash64 " +
      "on LongType (the q_priority_sample hash)") {
    val vals = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      123456789L, -987654321L)
    val exprs = vals.zipWithIndex
      .map { case (v, i) => s"xxhash64(CAST($v AS BIGINT)) AS h$i" }
      .mkString(", ")
    val row = spark.sql(s"SELECT $exprs").head()
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(row.getLong(i) === XxhReplaySql.hashLongConst(v), s"v=$v")
    }
  }

  test("priority-sample replay SQL embeds the pinned shape") {
    val sql = XxhReplaySql.prioritySampleSql
    assert(sql.contains("rk <= 5") && sql.contains("PARTITION BY lang"))
    assert(sql.contains(math.pow(2, -65).toString))
    assert(sql.contains("priority DESC, doc_id ASC"))
  }

  test("replay SQL embeds the pinned pipeline parameters") {
    val mh = XxhReplaySql.minhashNearDupSql
    // 32 signature mins, 8 band buckets, the 0.5 cutoff and 1000 guard
    assert(mh.contains("min(v.m31)") && !mh.contains("min(v.m32)"))
    assert(mh.contains("7 AS band") && !mh.contains("8 AS band"))
    assert(mh.contains(">= 0.5") && mh.contains("BETWEEN 2 AND 1000"))
    val sh = XxhReplaySql.simhashNearDupSql
    // 64 fingerprint bits, 4 bands, hamming <= 6
    assert(sh.contains("AS c63") && !sh.contains("AS c64"))
    assert(sh.contains("3 AS band") && !sh.contains("4 AS band"))
    assert(sh.contains("<= 6"))
  }

  test("splitmix replay SQLs embed the pinned sketch parameters and the " +
      "constants of the SHARED SketchAggs implementation") {
    import graft.functions.SketchAggs
    val cm = SplitmixReplaySql.cmWordsSql
    // the query's probe set, 4 depth rows, width 1024
    assert(cm.contains("'zzz_absent'") && cm.contains("% 1024"))
    assert(cm.contains("3 AS d") && !cm.contains("4 AS d"))
    // a probe bucket constant evaluated through the real chainHash/mix
    val b0 = SketchAggs.mix(SketchAggs.chainHash("the", 42L) + 0) & 1023
    assert(cm.contains(s"('the', 0, $b0)"))
    val bk = SplitmixReplaySql.bottomkSampleSql
    assert(bk.contains("rn <= 5"))
    assert(bk.contains(java.lang.Long.toUnsignedString(SketchAggs.mix(42L))))
  }
}
