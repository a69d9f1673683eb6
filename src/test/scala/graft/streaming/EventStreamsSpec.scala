package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming hourlyStats matches the batch shape on one microbatch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyStats(events)
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("update").start()
    try {
      mem.addData((ts(5), "click", 1.5), (ts(10), "click", 2.5),
        (ts(20), "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("hourly_test")
        .orderBy($"event_type").collect()
      assert(out.length === 2)
      assert(out(0).getAs[Long]("n_events") === 2)     // click ×2
      assert(out(0).getAs[Double]("sum_value") === 4.0)
    } finally q.stop()
  }

  test("dedupEvents drops re-delivered event ids within the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedupEvents(events, delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "click"), (1L, ts(1), "click"),  // redelivery
        (2L, ts(2), "view"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "click"), (3L, ts(4), "click"))  // again
      q.processAllAvailable()
      val out = spark.table("dedup_test").collect()
      assert(out.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("clickPurchaseJoin matches all clicks in the trailing window, bounded state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[(Long, Timestamp, Long)]
    val memP = MemoryStream[(Long, Timestamp, Long)]
    val clicks = memC.toDF().toDF("user_id", "ts", "click_id")
    val purchases = memP.toDF().toDF("user_id", "ts", "purchase_id")
    val q = EventStreams.clickPurchaseJoin(clicks, purchases, gap = "10 minutes")
      .writeStream.format("memory").queryName("cpjoin_test")
      .outputMode("append").start()
    try {
      // user 1: clicks at :00, :05, :20; purchase at :08 → matches :00, :05
      // (within 10 min, at-or-before), NOT :20 (after the purchase)
      memC.addData((1L, ts(0), 100L), (1L, ts(5), 101L), (1L, ts(20), 102L))
      memP.addData((1L, ts(8), 900L))
      q.processAllAvailable()
      val out = spark.table("cpjoin_test").orderBy($"click_id").collect()
      assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
        Seq((900L, 100L), (900L, 101L)))
      assert(out.map(_.getAs[Long]("gap_us")).toSeq ===
        Seq(8L * 60e6.toLong, 3L * 60e6.toLong))
    } finally q.stop()
  }

  test("sessionize splits on >gap and counts events per session") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = EventStreams.sessionize(events, gapMinutes = 10)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      // user 1: events at :00 :05 (one session), then :30 (new session)
      mem.addData((1L, ts(0)), (1L, ts(5)), (1L, ts(30)), (1L, ts(31)))
      q.processAllAvailable()
      // advance watermark far enough to time the open session out
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val out = spark.table("sessions_test").filter($"user_id" === 1L)
        .orderBy($"start_us").collect()
      assert(out.length === 2)
      assert(out(0).getAs[Long]("n_events") === 2)
      assert(out(1).getAs[Long]("n_events") === 2)
    } finally q.stop()
  }

  test("sessionize handles cross-batch out-of-order events (no inverted sessions)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = EventStreams.sessionize(events, gapMinutes = 10)
      .writeStream.format("memory").queryName("sessions_ooo_test")
      .outputMode("append").start()
    try {
      // batch 1 establishes state at :20; batch 2 delivers an EARLIER
      // event (:12, within the 10-min watermark) then a later one (:28).
      // Pre-fix, :12 overwrote last_us and the :28 gap test measured
      // 16 min from the wrong edge — splitting one true session in two.
      mem.addData((1L, ts(20)))
      q.processAllAvailable()
      mem.addData((1L, ts(12)), (1L, ts(28)))
      q.processAllAvailable()
      // time the session out
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val out = spark.table("sessions_ooo_test").filter($"user_id" === 1L)
        .collect()
      assert(out.length === 1, s"expected one merged session, got ${out.toSeq}")
      assert(out(0).getAs[Long]("n_events") === 3)
      assert(out(0).getAs[Long]("start_us") <= out(0).getAs[Long]("end_us"))
    } finally q.stop()
  }

  test("stream-static enrich: dimension attributes attach, misses survive " +
    "with nulls, parity with the batch join") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.0), ("view", 0.2)).toDF("event_type", "weight")
    val mem = MemoryStream[(Timestamp, String)]
    val rows = Seq((ts(1), "click"), (ts(2), "view"), (ts(3), "purchase"))
    val q = EventStreams.enrich(mem.toDF().toDF("ts", "event_type"), dim)
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("enrich_test").collect()
        .map(r => r.getAs[String]("event_type") ->
          Option(r.getAs[java.lang.Double]("weight"))).toMap
      assert(got === Map("click" -> Some(1.0), "view" -> Some(0.2),
        "purchase" -> None)) // unmatched kept, not dropped
      val batch = EventStreams.enrich(rows.toDF("ts", "event_type"), dim)
        .collect().map(r => r.getAs[String]("event_type") ->
          Option(r.getAs[java.lang.Double]("weight"))).toMap
      assert(got === batch)
    } finally q.stop()
  }
}
