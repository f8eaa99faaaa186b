package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Analytic-function coverage: range-frame windows, discrete quantiles,
  * pivot reshaping, and rollup grouping sets. These are API surfaces a
  * reference user reaches for constantly in reporting/EDA; each is stated
  * in its native Spark form and oracle-checked against an independent
  * DuckDB formulation.
  *
  * Determinism notes (QueryDef contract): quantiles use percentile_disc —
  * the DISCRETE quantile picks an actual element of the group, so there is
  * no interpolation arithmetic to diverge between engines; pivot cells
  * coalesce to 0 so absent (day, type) combos agree with the oracle's
  * conditional aggregation; rollup output orders with explicit NULLS LAST
  * on both engines (Spark defaults nulls-first on ASC, DuckDB nulls-last —
  * an unpinned ORDER BY would shuffle the subtotal rows between engines).
  */
object Analytic {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val defs: Seq[QueryDef] = Seq(
    /* Trailing range-frame window: each event sees the count + exact cents
     * sum of its user's events in the trailing hour INCLUDING itself. The
     * frame is VALUE-based (RANGE, not ROWS): ties on ts are all peers and
     * enter every peer's frame on both engines, so no tie-break column is
     * needed for determinism. One hash exchange on user_id; the frame
     * bound rides the same sort the window needs anyway.
     */
    QueryDef(
      "q64_trailing_window",
      (s, dir) => {
        val hourUs = 3600L * 1000000L
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-hourUs, 0)
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            unix_micros(col("ts")).as("us"))
          .withColumn("trail_n", count(lit(1)).over(w))
          .withColumn("trail_cents",
            sum(round(col("value") * 100).cast("long")).over(w))
          .select("event_id", "user_id", "trail_n", "trail_cents")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  count(*) OVER w AS trail_n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
             |       AS BIGINT) AS trail_cents
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    /* Discrete quantiles per group: percentile_disc returns the first
     * group element at-or-above the target rank — an actual double from
     * the data, bit-identical across engines by construction (no
     * interpolation). DuckDB's quantile_disc has the same definition.
     */
    QueryDef(
      "q65_quantiles",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"),
            expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"),
            min(col("value")).as("vmin"),
            max(col("value")).as("vmax"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  quantile_disc(value, 0.5) AS p50,
             |  quantile_disc(value, 0.9) AS p90,
             |  quantile_disc(value, 0.99) AS p99,
             |  min(value) AS vmin, max(value) AS vmax, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    /* Pivot reshaping: days × event types. The pivot VALUES are given
     * explicitly — with an inferred value set Spark runs an extra distinct
     * job and the output schema depends on the data; with explicit values
     * the plan is a single pass and the schema is fixed. Cells coalesce to
     * 0L so a (day, type) combo with no rows agrees with the oracle's
     * conditional count.
     */
    QueryDef(
      "q66_pivot",
      (s, dir) => {
        val pivoted = Tables(s, dir, "events")
          .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
            .as("day"), col("event_type"))
          .groupBy("day")
          .pivot("event_type", eventTypes)
          .agg(count(lit(1)))
        pivoted
          .select(col("day") +: eventTypes.map(t =>
            coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("day")
      },
      Some(s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |  ${eventTypes.map(t =>
                  s"count(CASE WHEN event_type = '$t' THEN 1 END) AS $t")
                  .mkString(", ")}
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    /* Rollup grouping sets: (flag, status), (flag), () subtotal levels in
     * one pass — Spark expands the rollup into a single expanded aggregate
     * (no N scans). gid = grouping(flag)*2 + grouping(status) is computed
     * identically on both engines; the ORDER BY pins NULLS LAST explicitly
     * because the engines' ASC null defaults differ.
     */
    QueryDef(
      "q67_rollup",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (grouping(col("l_returnflag")) * 2 +
              grouping(col("l_linestatus"))).cast("long").as("gid"),
            count(lit(1)).as("n"),
            sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
          .select("l_returnflag", "l_linestatus", "gid", "n", "qty_cents")
          .orderBy(col("gid"), asc_nulls_last("l_returnflag"),
            asc_nulls_last("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
             |       AS BIGINT) AS gid,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             |    AS qty_cents
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST"""
        .stripMargin)),

    /* Approximate sketches beside their exact twins — the cardinality /
     * quantile estimators a 100-TB profiling pass actually runs (exact
     * COUNT DISTINCT shuffles every distinct key; HLL merges fixed-size
     * registers map-side, and approx_percentile merges bounded
     * QuantileSummaries). Emitted WITH the exact answers so the error is
     * part of the result, and spec-bounded (rel_err under the 5% rsd
     * contract). No oracle: DuckDB's approx sketches are different
     * implementations, so cross-engine hashes cannot match — this is the
     * one query family where a rows-only driver check is the honest gate
     * (AnalyticSpec carries the quantitative assertions instead).
     */
    QueryDef(
      "q70_sketch_profile",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .agg(
            countDistinct(col("l_partkey")).as("nd_exact"),
            approx_count_distinct(col("l_partkey")).as("nd_approx"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
              .as("p50_exact"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("p50_approx"),
            count(lit(1)).as("n"))
          .withColumn("nd_rel_err",
            abs(col("nd_approx") - col("nd_exact")).cast("double") /
              col("nd_exact").cast("double"))
          .withColumn("p50_rel_err",
            abs(col("p50_approx") - col("p50_exact")) / col("p50_exact")),
      None)
  )
}
