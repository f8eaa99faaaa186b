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
    /* SCD-1 upsert (merge): apply a change-set to a dimension snapshot in
     * one full-outer pass — update where both sides match, insert
     * change-only rows, delete tombstones. Generalizes the reference's
     * add-if-absent anti-join (U2) to the full merge algebra. The
     * change-set is derived deterministically from the snapshot itself
     * (every 7th customer re-priced, every 13th tombstoned, 100 synthetic
     * inserts) so the oracle can state the same merge independently. At
     * scale this is ONE shuffle on the merge key for both sides — never a
     * per-row driver loop — and the change-set side would be the small
     * one in production (broadcastable); the full-outer stays
     * shuffle-based here because a real merge cannot assume the snapshot
     * fits anywhere.
     */
    QueryDef(
      "q71_upsert",
      (s, dir) => {
        val snap = Tables(s, dir, "customer").select(
          col("c_custkey").as("key"),
          col("c_name").as("name"),
          round(col("c_acctbal") * 100).cast("long").as("balance_cents"))
        val changes = snap
          .filter(col("key") % 7 === 0 || col("key") % 13 === 0)
          .select(col("key"),
            concat(lit("UPD:"), col("name")).as("name"),
            (col("balance_cents") + 500L).as("balance_cents"),
            (col("key") % 13 === 0).as("deleted"))
          .unionByName(
            Tables(s, dir, "customer").select(
              (col("c_custkey") + 10000000L).as("key"),
              concat(lit("NEW:"), col("c_name")).as("name"),
              lit(0L).as("balance_cents"), lit(false).as("deleted"))
              .filter(col("key") % 97 === 0))
        snap.as("s").join(changes.as("c"), Seq("key"), "full_outer")
          .filter(col("c.deleted").isNull || !col("c.deleted"))
          .select(col("key"),
            coalesce(col("c.name"), col("s.name")).as("name"),
            coalesce(col("c.balance_cents"), col("s.balance_cents"))
              .as("balance_cents"))
          .orderBy("key")
      },
      Some("""WITH snap AS (
             |  SELECT c_custkey AS key, c_name AS name,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS balance_cents
             |  FROM customer),
             |changes AS (
             |  SELECT key, 'UPD:' || name AS name,
             |    balance_cents + 500 AS balance_cents,
             |    key % 13 = 0 AS deleted
             |  FROM snap WHERE key % 7 = 0 OR key % 13 = 0
             |  UNION ALL
             |  SELECT c_custkey + 10000000 AS key, 'NEW:' || c_name AS name,
             |    0 AS balance_cents, false AS deleted
             |  FROM customer WHERE (c_custkey + 10000000) % 97 = 0)
             |SELECT coalesce(s.key, c.key) AS key,
             |  coalesce(c.name, s.name) AS name,
             |  CAST(coalesce(c.balance_cents, s.balance_cents) AS BIGINT)
             |    AS balance_cents
             |FROM snap s FULL OUTER JOIN changes c ON s.key = c.key
             |WHERE c.deleted IS NULL OR NOT c.deleted
             |ORDER BY key""".stripMargin)),

    /* Sliding-window aggregation: 1h windows every 15min — each event
     * lands in 4 overlapping buckets. Spark's `window(ts, len, slide)` is
     * a GENERATOR (the 4 bucket rows materialize map-side, epoch-aligned)
     * feeding one hash aggregate; the oracle rebuilds the same buckets
     * with a 0..3 series cross join. Tumbling is q60; this covers the
     * overlapping form whose streaming twin is the same expression.
     */
    QueryDef(
      "q72_sliding_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("n"), col("sum_value_cents"))
          .orderBy("win_start", "event_type"),
      // integer microsecond arithmetic, NOT epoch(ts): epoch returns a
      // DOUBLE where // does not floor, silently yielding per-event
      // "buckets" (caught by the row-count gate: 39947 vs 13528 groups)
      Some("""SELECT strftime(make_timestamp(
             |    900000000 * (epoch_us(ts) // 900000000) - i.i * 900000000),
             |    '%Y-%m-%d %H:%M:%S') AS win_start,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_value_cents
             |FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) i
             |WHERE epoch_us(ts)
             |      - (900000000 * (epoch_us(ts) // 900000000)
             |         - i.i * 900000000) < 3600000000
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

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
