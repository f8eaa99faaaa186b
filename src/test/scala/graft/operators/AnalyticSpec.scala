package graft.operators

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** q64–q67 analytic family: sequential replay of the range-frame window,
  * element-membership of the discrete quantiles, pivot row-sum
  * conservation, and rollup level consistency. Value parity vs DuckDB is
  * the driver gate; these pin semantics + plan shape.
  */
class AnalyticSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def us(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  test("q64 trailing window matches a sequential replay; one hash exchange") {
    val ev = Tables(spark, sf0001, "events")
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        us(r.getAs[java.sql.Timestamp]("ts")), r.getAs[Double]("value")))
    val byUser = ev.groupBy(_._2)
    val expected = ev.map { e =>
      val peers = byUser(e._2).filter(p => p._3 >= e._3 - 3600000000L && p._3 <= e._3)
      (e._1, e._2, peers.length.toLong,
        peers.map(p => BigDecimal(p._4 * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum)
    }.sortBy(_._1).toSeq
    val df = run("q64_trailing_window")
    val got = df.collect().map(r => (r.getAs[Long]("event_id"),
      r.getAs[Long]("user_id"), r.getAs[Long]("trail_n"),
      r.getAs[Long]("trail_cents"))).toSeq
    assert(got == expected)
    val hash = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s.outputPartitioning
    }.collect { case h: HashPartitioning => h }
    assert(hash.size == 1, s"one user_id exchange expected, got $hash")
  }

  test("q65 discrete quantiles are ordered actual elements of each group") {
    val vals = Tables(spark, sf0001, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = run("q65_quantiles").collect()
    assert(rows.length == vals.size)
    rows.foreach { r =>
      val (t, p50, p90, p99) = (r.getAs[String]("event_type"),
        r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99, t)
      // DISCRETE quantile contract: every output is a value that occurs
      assert(Set(p50, p90, p99).subsetOf(vals(t)), t)
      assert(r.getAs[Double]("vmin") <= p50 && p99 <= r.getAs[Double]("vmax"))
    }
  }

  test("q66 pivot conserves per-day totals and fills absent cells with 0") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val got = run("q66_pivot").collect()
    assert(got.head.schema.fieldNames.toSeq == "day" +: types)
    val dayTotals = Tables(spark, sf0001, "events")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val rowSum = types.map(t => r.getAs[Long](t)).sum
      assert(rowSum == dayTotals(r.getAs[String]("day")))
      types.foreach(t => assert(r.getAs[Long](t) >= 0L))
    }
    assert(got.length == dayTotals.size)
  }

  test("q67 rollup levels are mutually consistent") {
    val rows = run("q67_rollup").collect().map(r =>
      (Option(r.getAs[String]("l_returnflag")),
        Option(r.getAs[String]("l_linestatus")), r.getAs[Long]("gid"),
        r.getAs[Long]("n"), r.getAs[Long]("qty_cents")))
    val detail = rows.filter(_._3 == 0L)
    val flagSub = rows.filter(_._3 == 1L)
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1)
    assert(rows.length == detail.length + flagSub.length + 1)
    assert(grand.head._4 == detail.map(_._4).sum)
    assert(grand.head._5 == detail.map(_._5).sum)
    flagSub.foreach { case (flag, status, _, n, cents) =>
      assert(status.isEmpty)
      val d = detail.filter(_._1 == flag)
      assert(n == d.map(_._4).sum && cents == d.map(_._5).sum, flag)
    }
    // rollup, not cube: no status-only subtotal level
    assert(!rows.exists(_._3 == 2L))
  }

  test("q71 upsert applies updates, drops tombstones, lands inserts") {
    val snap = Tables(spark, sf0001, "customer")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0)).toSet
    val rows = run("q71_upsert").collect()
    val byKey = rows.map(r => r.getAs[Long]("key") -> r).toMap
    snap.foreach { k =>
      if (k % 13 == 0) assert(!byKey.contains(k), s"tombstone $k survived")
      else if (k % 7 == 0)
        assert(byKey(k).getAs[String]("name").startsWith("UPD:"), k)
      else assert(!byKey(k).getAs[String]("name").startsWith("UPD:") &&
        !byKey(k).getAs[String]("name").startsWith("NEW:"), k)
    }
    val inserts = rows.filter(_.getAs[String]("name").startsWith("NEW:"))
    assert(inserts.nonEmpty)
    inserts.foreach { r =>
      assert(r.getAs[Long]("key") > 10000000L)
      assert(r.getAs[Long]("balance_cents") == 0L)
    }
    val tombstones = snap.count(_ % 13 == 0)
    assert(rows.length == snap.size - tombstones + inserts.length)
  }

  test("q72 sliding windows hold each event exactly 4 times") {
    val total = Tables(spark, sf0001, "events").count()
    val rows = run("q72_sliding_window").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 4L * total)
    // window starts are slide-aligned (multiples of 15 min)
    rows.foreach { r =>
      val mins = r.getAs[String]("win_start").takeRight(5)
      assert(Seq("00:00", "15:00", "30:00", "45:00").contains(mins), mins)
    }
  }

  test("q70 sketches sit within their error contracts against exact twins") {
    val r = run("q70_sketch_profile").collect()
    assert(r.length == 1)
    val row = r.head
    // HLL++ default rsd is 5%; allow 3 sigma
    assert(row.getAs[Double]("nd_rel_err") <= 0.15,
      s"HLL off by ${row.getAs[Double]("nd_rel_err")}")
    // approx_percentile with accuracy 10000 over ~6k rows is near-exact;
    // allow 1% drift on the median
    assert(row.getAs[Double]("p50_rel_err") <= 0.01,
      s"p50 off by ${row.getAs[Double]("p50_rel_err")}")
    assert(row.getAs[Long]("nd_exact") > 0 && row.getAs[Long]("n") > 0)
  }
}
