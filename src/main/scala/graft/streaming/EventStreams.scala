package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming versions of the events queries (graft.queries.
  * Events): the same column expressions run incrementally with watermarks.
  * The reference has no streaming surface (SURVEY.md §0); this is part of
  * the training-pipeline north star.
  *
  * Batch/stream parity: hourlyStats here uses window($"ts") where the
  * batch query uses date_trunc — same bucket boundaries (UTC session tz).
  * Sessionization uses flatMapGroupsWithState with event-time timeout —
  * the open-ended gap-session semantics the batch lag/cumsum query
  * computes retrospectively.
  */
object EventStreams {

  /** File-source stream over a directory of events parquet (ts already a
    * µs timestamp — callers reading the raw ns corpus should route through
    * graft.sources.Tables.events for the batch side). */
  def readEvents(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)

  /** Tumbling 1-hour windowed counts/sums per event type, 2h watermark. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact deduplication on event_id — the streaming twin of
    * graft.operators.Dedup.exact for at-least-once ingest (a training-data
    * pipeline's first stage). dropDuplicatesWithinWatermark keeps one
    * compact state entry per id and EXPIRES it once the watermark passes,
    * so state is bounded by the delay window × ingest rate — a plain
    * dropDuplicates would grow state forever on an unbounded stream. */
  def dedupEvents(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STATIC enrichment join — the stateless third join flavor
    * next to stream-stream (clickPurchaseJoin) and the CDC sink: each
    * micro-batch left-outer-joins the (small) dimension table, no watermark
    * and no state store because the static side is complete by
    * definition; Spark re-plans the dimension as a broadcast per batch,
    * so at scale this is the map-only enrich step. Left-outer keeps
    * unmatched events with null attributes (the batch labelJoin
    * convention) so the enrich never silently drops. */
  def enrich(events: DataFrame, dim: DataFrame,
      key: String = "event_type"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Stream-stream interval join — the incremental twin of
    * graft.operators.TemporalJoin.timeRangePairs: each purchase joined to
    * every click by the same user within the trailing `gap`. Both sides
    * carry watermarks and the join condition bounds event time on BOTH
    * ends, so Spark derives state-expiry watermarks for each side and the
    * join state stays bounded by gap × ingest rate — the unbounded-state
    * trap of an unconstrained stream-stream join is structurally avoided.
    *
    * Note the semantic difference from the batch as-of join: "latest click
    * only" needs a post-join aggregation (a second stateful stage);
    * streaming pipelines usually take all-in-window matches (this shape)
    * and reduce downstream.
    *
    * @param clicks    (user_id, ts, click_id)
    * @param purchases (user_id, ts, purchase_id)
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      gap: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", gap)
      .select(col("user_id"), col("ts").as("click_ts"), col("click_id"))
    val p = purchases.withWatermark("ts", gap)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("purchase_id"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $gap"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("gap_us"))
  }

  case class EventIn(user_id: Long, ts: java.sql.Timestamp) {
    /** exact µs since epoch (Timestamp carries ns resolution). */
    def tsUs: Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  }
  case class SessionState(start_us: Long, last_us: Long, n_events: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Gap-based sessionization with custom state: emits a session row when
    * a >gapMinutes gap (or event-time timeout) closes it. The streaming
    * twin of graft.queries.Events.userSessions. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L

    def fn(userId: Long, in: Iterator[EventIn],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = in.toSeq.map(e => (e.user_id, e.tsUs)).sortBy(_._2)
      var st = state.getOption
      val out = Seq.newBuilder[SessionOut]
      if (state.hasTimedOut) {
        st.foreach(s => out += SessionOut(userId, s.start_us, s.last_us, s.n_events))
        state.remove()
        st = None
      }
      for ((_, eUs) <- sorted) {
        st match {
          case Some(s) if eUs - s.last_us <= gapUs =>
            // min/max, not overwrite: an event from a LATER batch can be
            // earlier than the stored state (in-batch sorting can't order
            // across batches; the watermark admits it). Overwriting
            // last_us with an older timestamp inverted sessions
            // (end < start) and made the next gap test measure from the
            // wrong edge, splitting sessions spuriously. Such a late
            // event extends the session conservatively backward.
            st = Some(s.copy(
              start_us = math.min(s.start_us, eUs),
              last_us = math.max(s.last_us, eUs),
              n_events = s.n_events + 1))
          case Some(s) =>
            out += SessionOut(userId, s.start_us, s.last_us, s.n_events)
            st = Some(SessionState(eUs, eUs, 1))
          case None =>
            st = Some(SessionState(eUs, eUs, 1))
        }
      }
      st.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last_us / 1000L + gapMinutes * 60L * 1000L)
      }
      out.result().iterator
    }

    // NOTE: the watermarked event-time column `ts` must reach the stateful
    // operator unprojected — deriving µs before groupByKey would strip the
    // watermark tag and fail analysis (event-time timeout needs it).
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }
}
