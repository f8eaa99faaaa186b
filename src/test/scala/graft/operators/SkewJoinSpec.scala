package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The engine's join-skew stance (SURVEY §4): per-operator hot-key CAPS
  * where semantics allow dropping boilerplate (Dedup.capHotKeys), salting
  * where the result must be exact and the operator is a window (q68), and
  * ADAPTIVE skew-join splitting for exact shuffle joins — this spec proves
  * the third leg actually engages rather than being an asserted comment:
  * with a half-the-table hot key, AQE rewrites the sort-merge join's hot
  * partition into splits (`skew=true` on the join node).
  */
class SkewJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force the shuffle join and scale the skew thresholds down to the
      // test's data volume (defaults target 256MB partitions)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // half of the fact rows share key 0 — one shuffle partition gets
      // ~100k rows while the median partition holds a few hundred
      val fact = spark.range(200000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      val n = joined.count()
      assert(n > 0)
      joined.collect()
      val smj = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join")
      assert(smj.exists(_.isSkewJoin),
        s"AQE did not mark the join skewed:\n${joined.queryExecution.executedPlan}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
