package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB co-location pattern: writing both sides of a recurring
  * equi-join bucketed by the join key lets every subsequent join run
  * shuffle-FREE (sort-merge over pre-bucketed files). This is the
  * production shape for the tagger's repeated id-keyed joins and the
  * Part-4 generic_key joins when the dimension outgrows broadcast.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets")
    val n = 1000
    val facts = (1 to n).map(i => (i.toLong % 97, s"payload$i")).toDF("k", "p")
    val dims = (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "d")

    facts.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/facts").saveAsTable("graft_facts_b")
    dims.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/dims").saveAsTable("graft_dims_b")
    try {
      // merge hint forces SMJ (a broadcast would trivially have no
      // shuffle and prove nothing about bucketing)
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b").hint("merge"), Seq("k"))
        .filter(col("d").isNotNull)
      assert(joined.count() == n)
      val plan = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(plan) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
