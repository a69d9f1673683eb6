package graft

import graft.SparkSpec

/** Smoke + invariants for every SparkEntry query at sf0.001. Value-level
  * correctness is enforced by the driver's DuckDB oracle (and locally by
  * tools/compare.py at sf0.01); this spec guards the contract: every
  * query runs, every oracle key has a query, the flagship is non-empty. */
class QueriesSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and yields a stable schema") {
      val df = fn(spark, sf("sf0.001"))
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length) // no dup names
    }
  }
}
