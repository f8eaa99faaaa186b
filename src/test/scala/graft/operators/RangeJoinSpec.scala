package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** q63: the bucketed interval decomposition must (a) produce EXACTLY the
  * naive non-equi join's answer and (b) execute as a broadcast hash
  * equi-join — never the nested loop Spark would pick for the bare
  * inequality predicate.
  */
class RangeJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def run() = graft.SparkEntry.queries("q63_range_join")(spark, sf0001)

  test("q63 equals the naive inequality join row for row") {
    val iv = Tables(spark, sf0001, "nation").select(
      col("n_nationkey").as("interval_id"),
      (lit(900.0) + col("n_nationkey") * 4000.0).as("lo"),
      (lit(900.0) + col("n_nationkey") * 4000.0 + 3000.0 +
        (col("n_nationkey") % 5) * 2500.0).as("hi"))
    val probe = Tables(spark, sf0001, "lineitem")
      .select(col("l_extendedprice").as("price"))
    // Spark executes this as BroadcastNestedLoopJoin — the semantics
    // ground truth the decomposition must reproduce
    val naive = probe.join(iv,
        col("price") >= col("lo") && col("price") < col("hi"))
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("price") * 100).cast("long")).as("sum_price_cents"))
      .orderBy("interval_id")
      .collect().map(_.toSeq).toSeq
    val got = run().collect().map(_.toSeq).toSeq
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("q63 plans as a broadcast equi-join, not a nested loop") {
    val df = run()
    df.collect()
    val plan = df.queryExecution.executedPlan
    val bnlj = collectWithSubqueries(plan) {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bnlj.isEmpty, "range join regressed to a nested loop")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "bucket equi-join must broadcast the interval index")
  }

  test("q63 intervals exercise overlap, gap, and out-of-range rows") {
    // the dim is irregular BY DESIGN: widths 3000-13000 vs spacing 4000.
    // If every probe row matched exactly one interval the decomposition
    // could silently degrade to a plain bucketing; pin multi-match and
    // no-match populations so the residual predicate stays load-bearing.
    val iv = (0 until 25).map { k =>
      val lo = 900.0 + k * 4000.0
      (k, lo, lo + 3000.0 + (k % 5) * 2500.0)
    }
    val prices = Tables(spark, sf0001, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
    val matchCounts = prices.map(p => iv.count(i => p >= i._2 && p < i._3))
    assert(matchCounts.exists(_ >= 2), "no overlapping-interval row")
    assert(matchCounts.contains(0), "no gap row")
    // total output count equals the sum of per-row match counts
    val total = run().agg(sum(col("n_items"))).collect()(0).getLong(0)
    assert(total == matchCounts.map(_.toLong).sum)
  }
}
