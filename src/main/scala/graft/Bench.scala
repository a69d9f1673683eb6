package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}

/** Throughput benchmark over SparkEntry.queries at SPARK_GRAFT_SF_DIR.
  *
  * Hardened for the driver's wall-clock gate (round-1 ran to the external
  * timeout and emitted nothing):
  *  - per-query cap (SPARK_GRAFT_QUERY_CAP, default 45 s): the query's
  *    Spark jobs run under a job group and are cancelled on expiry;
  *  - global budget (SPARK_GRAFT_BENCH_BUDGET, default 300 s of query
  *    loop): remaining queries are skipped, not silently dropped;
  *  - failures are NOT timed as successes — a throwing query records -1
  *    and lands in "failed"; timeouts/skips land in "timedout"/"skipped".
  *  The JSON line is always printed, whatever happens above it.
  *
  * Queries run cheap-core-first so a budget cut trims the heavy library
  * tail, never the oracle-checked relational core.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs at local[32] — default to the machine's cores,
    // capped, rather than a conservative 4 (the driver may not export
    // SPARK_GRAFT_CPUS).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val capSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_CAP", "45").toLong
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "300").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: touch every table and exercise codegen/shuffle
    // machinery once, so the first timed query doesn't absorb JVM/JIT/
    // page-cache warmup (measured as a 5-10× first-query penalty).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try graft.sources.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Plain scans leave the join/aggregate/window codegen and shuffle
    // writer paths cold — the first timed queries (tiny 6-25 row semi-
    // joins) were absorbing multi-second JIT penalties at every SF. Two
    // cheap representative queries compile those paths untimed.
    Seq("q_top_orders", "q_label_join").foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    // Queries run on daemon pool threads so a hung query (even one that
    // ignores job-group cancellation) can never block JVM exit.
    val pool = Executors.newCachedThreadPool { (r: Runnable) =>
      val t = new Thread(r); t.setDaemon(true); t
    }
    val all = SparkEntry.queries
    val ordered = SparkEntry.orderedQueryNames

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    val timedout = scala.collection.mutable.ListBuffer[String]()
    val skipped = scala.collection.mutable.ListBuffer[String]()
    val loopStart = System.nanoTime()
    ordered.foreach { name =>
      val elapsed = (System.nanoTime() - loopStart) / 1e9
      if (elapsed > budgetSec) { skipped += name; times(name) = -1.0 }
      else {
        val fn = all(name)
        val fut = pool.submit(new Callable[Long] {
          def call(): Long = {
            spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
            try fn(spark, sfDir).count()
            finally spark.sparkContext.clearJobGroup()
          }
        })
        val t0 = System.nanoTime()
        val outcome =
          try { fut.get(capSec, TimeUnit.SECONDS); "ok" }
          catch {
            case _: TimeoutException =>
              spark.sparkContext.cancelJobGroup(name); fut.cancel(true)
              timedout += name; "timeout"
            case e: Throwable =>
              failed += name
              val root = Option(e.getCause).getOrElse(e)
              System.err.println(s"[bench] $name FAILED: ${root.toString.take(300)}")
              "failed"
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // failures record -1 (not a fake tiny timing); timeouts record the
        // real wall spent before cancellation — they did burn that time.
        times(name) = if (outcome == "failed") -1.0 else sec
        System.err.println(f"[bench] $name%-28s $sec%8.2f s  [$outcome]")
        // GC between heavy queries so eviction debt doesn't land in the
        // successor's timing. Deliberately NOT catalog.clearCache(): that
        // would drop the session-scoped materialized intermediates
        // (TextAnalysis.scoredNearDupPairs, GraphQueries.components) the
        // pair-graph queries share; every other cache in the engine is
        // unpersisted by its owning operator, and broadcast/shuffle state
        // is reclaimed by the ContextCleaner.
        if (sec > 2.0) System.gc()
      }
    }
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = times.values.filter(_ >= 0).sum
    def line(decimals: Int, fullDir: Boolean, allEntries: Boolean) = {
      val fmt = s"%.${decimals}f"
      val qs = times
        .filter { case (_, v) => allEntries || v >= 0 }
        .map { case (k, v) => "\"" + k + "\":" + fmt.format(v) }
        .mkString("{", ",", "}")
      val sf = if (fullDir) sfDir else new java.io.File(sfDir).getName
      // outcome arrays are this engine's addition to the contract line —
      // on the compact form, emit them only when non-empty (every char
      // counts against the bounded output capture; the full-file form
      // always carries all three)
      val outcomes = Seq(
        "failed" -> failed.toSeq, "timedout" -> timedout.toSeq,
        "skipped" -> skipped.toSeq)
        .filter { case (_, xs) => allEntries || xs.nonEmpty }
        .map { case (k, xs) => s""","$k":${arr(xs)}""" }.mkString
      s"""{"metric":"total","value":${fmt.format(total)},"unit":"sec","queries":$qs,"sf":"$sf"$outcomes}"""
    }
    // The driver captures a bounded (~2000-char) tail of this process's
    // output; with 75+ queries a 3-decimal line overflows it and
    // truncates mid-JSON (ADVICE r5), and sbt's epilogue lines eat into
    // the same tail. Stdout gets the compact form (1 decimal — 0.1 s
    // resolution; basename sf; failed/timedout/skipped entries carried
    // only in their arrays, not duplicated as -1 times) — 84 queries ≈
    // 1900 chars. Full precision goes to stderr per-query lines and the
    // bench_last.json repo file, which survive regardless of capture
    // size.
    println(line(decimals = 1, fullDir = false, allEntries = false))
    try {
      val w = new java.io.PrintWriter("bench_last.json")
      try w.println(line(decimals = 3, fullDir = true, allEntries = true))
      finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
