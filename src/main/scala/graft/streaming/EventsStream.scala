package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming form of the engine's time-bucketed aggregations
  * (SURVEY §2.10: the reference is batch-only; the streaming surface
  * demonstrates the same operator semantics under readStream).
  *
  * These are plan-builders over an unbounded DataFrame: the same code path
  * works for `spark.readStream.schema(...).parquet(dir)` in production and
  * MemoryStream in tests. Watermarking bounds state; the aggregation is
  * identical to the batch q60 plan, so batch/stream parity is testable.
  */
object EventsStream {

  /** Hourly tumbling-window counts + exact cents sums per event_type.
    * 2h watermark: late events beyond that are dropped, state is bounded.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("window.start").as("hr"), col("event_type"),
        col("n"), col("sum_value_cents"))

  /** Streaming exact dedup on event_id — the training-pipeline ingest
    * primitive (duplicate delivery is the norm for at-least-once
    * sources). `dropDuplicatesWithinWatermark` keeps state ONLY for ids
    * within the watermark horizon, so state size is bounded by event
    * rate x 2h instead of growing forever like a plain
    * `dropDuplicates` on a stream.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user RUNNING totals via `mapGroupsWithState` — the custom-state
    * escape hatch for semantics the built-in windowed aggregations can't
    * express (cumulative state across all micro-batches). State is one
    * (count, cents) pair per user — by DESIGN unbounded in time (a
    * running total is a forever metric; state size is bounded by the
    * user dimension, not the event volume). A deployment that instead
    * wants totals-within-an-activity-horizon should evict idle users
    * with an EVENT-time TTL exactly as [[DedupStream.nearDupFlags]]
    * does (watermark + EventTimeTimeout + lastSeen in state) — NOT
    * ProcessingTimeTimeout, which makes the micro-batch engine
    * re-trigger empty batches forever (`shouldRunAnotherBatch` is
    * unconditionally true once wall-clock deadlines exist; measured as
    * a 100%-CPU idle stream and a hanging `processAllAvailable`).
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
            state: GroupState[(Long, Long)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          (user, n, s)
      }
      .toDF("user_id", "n_events", "sum_value_cents")
  }

  /** Stream-stream INTERVAL join — the built-in two-stream surface (the
    * stateful custom shapes live in [[AsOfStream]]/[[DedupStream]]): each
    * click pairs with every purchase by the same user in the click's
    * trailing hour. Both sides carry a watermark and the join condition
    * bounds event-time distance, which is exactly what lets the engine
    * evict buffered rows: a purchase older than
    * `watermark - interval` can never join a future click, so per-side
    * state is bounded by rate x (lateness + interval), independent of
    * stream length. Inner-join rows emit as soon as both sides arrive
    * (no watermark wait); it is the OUTER variants that defer to the
    * watermark. Self-join of one input stream is the deployment shape
    * here (one events topic, two filters) and is supported natively.
    */
  def recentPurchaseJoin(
      events: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", lateness)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", lateness)
    clicks.join(purchases,
        expr("""c_user = p_user
               |AND p_ts >= c_ts - INTERVAL 1 HOUR
               |AND p_ts <= c_ts""".stripMargin))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("purchase_id"), col("value"),
        (unix_micros(col("c_ts")) - unix_micros(col("p_ts"))).as("age_us"))
  }

  /** Per-user session aggregates via the built-in session_window (Spark
    * 3.2+) — keyed stateful aggregation without custom state. This is the
    * STREAMING twin of the oracle-gated batch q61 (`Events` q61_sessionize):
    * session_window opens a new session when the gap is >= `gap` while
    * q61's lag-formulation splits on gap > threshold, so the two agree on
    * every corpus with no exact-threshold gap (EventsStreamSpec pins the
    * parity on the sf0.001 events table and asserts the edge is absent).
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value_cents"))
}
