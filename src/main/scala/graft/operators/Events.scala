package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Time-series aggregation over the `events` table. The reference is
  * batch-only (SURVEY §2.10), so windowed aggregation is demonstrated in
  * batch form here; the Structured Streaming variant of the same plan
  * (readStream + watermark + window) lives in graft.streaming and is
  * covered by ScalaTest.
  *
  * Determinism: the hour bucket is emitted as a formatted string (session
  * TZ is UTC) so parquet-timestamp annotation differences between engines
  * cannot perturb the driver's hash; `value` is aggregated with
  * order-insensitive min/max plus exact cents sums.
  */
object Events {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q60_event_hourly",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hr"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(round(col("value") * 100).cast("long")).as("sum_value_cents"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
          .orderBy("hr", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
             |  event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
             |  min(value) AS min_value, max(value) AS max_value
             |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    /* Gap-based sessionization: a user's events split into sessions
     * wherever the inter-event gap exceeds 6 hours. The classic two-window
     * formulation (lag -> new-session flag -> running sum = session number)
     * runs BOTH windows and the per-session aggregate over ONE exchange:
     * the windows share partitionBy(user_id)/orderBy(ts, event_id), and the
     * downstream groupBy(user_id, session_no)'s ClusteredDistribution is
     * already satisfied by hash(user_id) (subset-of-keys rule), so the
     * whole query is a single shuffle on user_id regardless of corpus
     * size — at 100 TB the session count per user is bounded by the
     * activity horizon, never by total volume. Ties on ts are broken by
     * event_id on both engines, so the session numbering is total-ordered
     * and the hash comparison exact.
     */
    QueryDef(
      "q61_sessionize",
      (s, dir) => {
        val gapUs = 6L * 3600L * 1000000L
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
              .otherwise(0L))
          .withColumn("session_no", sum(col("new_s")).over(run))
          .groupBy("user_id", "session_no")
          .agg(
            count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"),
            sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
          .orderBy("user_id", "session_no")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS session_no
             |  FROM flagged)
             |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
             |  count(*) AS n_events,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_value_cents
             |FROM sess GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    /* As-of join: each 'click' event picks up the most recent 'purchase'
     * by the same user at-or-before its own timestamp (the canonical
     * feature-lookup shape: "state as of event time"). Implemented WITHOUT
     * a join: both sides union into one frame tagged build(0)/probe(1),
     * sort within user by (ts, side, event_id), and a running
     * last(ignoreNulls) carries the latest build row forward onto every
     * probe. One shuffle on user_id total, no inequality join, no
     * per-probe fanout — the 100-TB plan for as-of semantics (an
     * inequality join would be a nested-loop; the union+window is linear
     * in events per user). Builds sort BEFORE probes at equal ts (side
     * 0 < 1), pinning the ts <= probe_ts inclusive bound; among builds
     * tied on (user, ts) the ordering by event_id makes `last` pick the
     * max event_id — mirrored exactly by the oracle's
     * ORDER BY b.ts DESC, b.event_id DESC row_number() = 1.
     */
    QueryDef(
      "q62_asof_join",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val builds = ev.filter(col("event_type") === "purchase").select(
          col("user_id"), col("ts"), col("event_id"), lit(0).as("side"),
          col("event_id").as("b_id"), col("value").as("b_value"),
          unix_micros(col("ts")).as("b_us"))
        val probes = ev.filter(col("event_type") === "click").select(
          col("user_id"), col("ts"), col("event_id"), lit(1).as("side"),
          lit(null).cast("long").as("b_id"),
          lit(null).cast("double").as("b_value"),
          lit(null).cast("long").as("b_us"))
        val w = Window.partitionBy("user_id").orderBy("ts", "side", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        builds.unionByName(probes)
          .withColumn("match_id", last(col("b_id"), ignoreNulls = true).over(w))
          .withColumn("match_value",
            last(col("b_value"), ignoreNulls = true).over(w))
          .withColumn("match_us", last(col("b_us"), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(
            col("event_id").as("probe_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("probe_ts"),
            col("match_id"),
            col("match_value"),
            (unix_micros(col("ts")) - col("match_us")).as("staleness_us"))
          .orderBy("probe_id")
      },
      Some("""WITH probe AS (SELECT * FROM events WHERE event_type = 'click'),
             |build AS (SELECT * FROM events WHERE event_type = 'purchase'),
             |best AS (
             |  SELECT p.event_id AS probe_id, b.event_id AS b_id,
             |    b.value AS b_value, b.ts AS b_ts,
             |    row_number() OVER (PARTITION BY p.event_id
             |                       ORDER BY b.ts DESC, b.event_id DESC) AS rn
             |  FROM probe p JOIN build b
             |    ON b.user_id = p.user_id AND b.ts <= p.ts)
             |SELECT p.event_id AS probe_id, p.user_id,
             |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS probe_ts,
             |  b.b_id AS match_id, b.b_value AS match_value,
             |  epoch_us(p.ts) - epoch_us(b.b_ts) AS staleness_us
             |FROM probe p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
             |  ON p.event_id = b.probe_id
             |ORDER BY probe_id""".stripMargin))
  )
}
