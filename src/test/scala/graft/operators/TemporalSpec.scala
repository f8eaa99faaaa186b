package graft.operators

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec
import graft.core.Tables

/** q61 (gap sessionization) and q62 (as-of join): exact sequential replay
  * of the semantics on the driver side plus physical-plan shape pins. The
  * DuckDB hash gate covers value parity at sf0.01; these specs prove the
  * SCALE claims — one hash exchange for the whole query, and (for q62)
  * no join operator at all.
  */
class TemporalSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)
  private val GapUs = 6L * 3600L * 1000000L

  private def us(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def cents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q61 sessionize matches a sequential per-user replay exactly") {
    val ev = Tables(spark, sf0001, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (us(r._2), r._3))
      // split into sessions wherever the gap exceeds 6h
      val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, java.sql.Timestamp, Long, Double)]]) {
        case (acc, r) =>
          if (acc.isEmpty || us(r._2) - us(acc.last.last._2) > GapUs)
            acc :+ Vector(r)
          else acc.init :+ (acc.last :+ r)
      }
      sessions.zipWithIndex.map { case (sess, i) =>
        (uid, (i + 1).toLong, sess.size.toLong,
          fmt.format(sess.head._2.toInstant), fmt.format(sess.last._2.toInstant),
          us(sess.last._2) - us(sess.head._2),
          sess.map(r => cents(r._4)).sum)
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q61_sessionize").collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("session_no"),
        r.getAs[Long]("n_events"), r.getAs[String]("session_start"),
        r.getAs[String]("session_end"), r.getAs[Long]("duration_us"),
        r.getAs[Long]("sum_value_cents"))).toSeq
    assert(got == expected)
  }

  test("q61 runs both windows and the aggregate over ONE hash exchange") {
    val df = run("q61_sessionize")
    df.collect()
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s.outputPartitioning
    }
    val hash = shuffles.collect { case h: HashPartitioning => h }
    val range = shuffles.collect { case r: RangePartitioning => r }
    assert(hash.size == 1,
      s"expected exactly one hash exchange (user_id), got: $shuffles")
    assert(hash.head.expressions.map(_.sql.toLowerCase)
      .exists(_.contains("user_id")))
    assert(range.size <= 1, "only the output ORDER BY may range-partition")
  }

  test("q62 as-of join matches a sequential per-user replay exactly") {
    val ev = Tables(spark, sf0001, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val purchasesByUser = ev.filter(_._4 == "purchase").groupBy(_._1)
    val expected = ev.filter(_._4 == "click").map { c =>
      val cand = purchasesByUser.getOrElse(c._1, Array.empty)
        .filter(b => us(b._2) <= us(c._2))
      val best =
        if (cand.isEmpty) None
        else Some(cand.maxBy(b => (us(b._2), b._3)))
      (c._3, c._1, fmt.format(c._2.toInstant),
        best.map(_._3), best.map(_._5), best.map(b => us(c._2) - us(b._2)))
    }.sortBy(_._1).toSeq
    val got = run("q62_asof_join").collect().map { r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("probe_ts"),
        Option(r.getAs[java.lang.Long]("match_id")).map(_.longValue),
        Option(r.getAs[java.lang.Double]("match_value")).map(_.doubleValue),
        Option(r.getAs[java.lang.Long]("staleness_us")).map(_.longValue))
    }.toSeq
    assert(got == expected)
    // the data must actually exercise both arms
    assert(got.exists(_._4.isDefined), "no matched probe in testdata")
    assert(got.forall(_._6.forall(_ >= 0L)), "match after probe ts")
  }

  test("q62 contains NO join operator: one hash exchange carries the as-of") {
    val df = run("q62_asof_join")
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("Join"), s"as-of must be join-free:\n$planStr")
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s.outputPartitioning
    }
    val hash = shuffles.collect { case h: HashPartitioning => h }
    assert(hash.size == 1,
      s"expected exactly one hash exchange (user_id), got: $shuffles")
  }
}
