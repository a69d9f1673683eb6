package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the count-vs-valued divergence itself (VERDICT r16 #4): a
  * deterministic projected expression under `count()` is PRUNED to zero
  * evaluations, while `ProfileValued.timeValued` forces one evaluation
  * per row. If a Spark upgrade ever changes either side, the probe
  * discipline recorded in SCALE_r16 §6b needs re-deriving — this test is
  * the tripwire. */
class ProfileValuedSpec extends SparkSpec {
  import ProfileValuedSpec._

  private val countingSq = udf { x: Long => evals.incrementAndGet(); x * x }

  test("count() prunes a projected deterministic expression to ZERO " +
      "evaluations; timeValued forces one per row") {
    val s = spark
    import s.implicits._
    def frame = s.range(100).select(countingSq(col("id")).as("sig"))
    evals.set(0L)
    val (n0, _) = ProfileValued.timeCounted(frame)
    assert(n0 === 100L)
    assert(evals.get() === 0L,
      s"count() evaluated the expression ${evals.get()} times — the " +
        "SCALE_r16 §6b pruning premise no longer holds")
    val (n1, _) = ProfileValued.timeValued(frame, col("sig"))
    assert(n1 === 100L)
    assert(evals.get() >= 100L,
      s"valued probe only reached ${evals.get()} evaluations")
  }
}

object ProfileValuedSpec {
  /** JVM-global: local-mode executor threads share it with the driver. */
  val evals = new AtomicLong(0L)
}
