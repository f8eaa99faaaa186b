package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
             |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin))
  )
}
