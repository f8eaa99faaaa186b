package graft.operators

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

import graft.SparkSpec

/** The persisted Lloyd assignment behind q113: the serving path must
  * READ the learned cells, not re-learn them, and the within-cell pair
  * join must ride the cid bucketing with no exchange.
  */
class ClusterIndexSpec extends SparkSpec {

  private val dir = sf0001

  private def q(name: String) = Clustering.defs.find(_.name == name).get.fn

  private def rows(name: String): Seq[(Long, Long, Option[Long], Boolean)] =
    q(name)(spark, dir).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))

  test("q113 from the persisted assignment equals q104's in-query Lloyd") {
    val want = rows("q104_semdedup_cells")
    val got = rows("q113_semdedup_indexed")
    assert(want.exists(!_._4), "corpus must contain at least one semdedup prune")
    assert(got == want)
  }

  test("q113 plan: the pair join reads the index bucketed, exchange-free") {
    ClusterIndex.ensure(spark, dir)
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = q("q113_semdedup_indexed")(spark, dir)
        .queryExecution.executedPlan
      val name = ClusterIndex.tableNameFor(dir)
      val scans = plan.collect {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == name) => f
      }
      assert(scans.size == 3,
        s"pair join (2 sides) + final join-back must read the index:\n$plan")
      // the cid pair join itself: a sort-merge join with NO shuffle on
      // either side — both legs are the BUCKETED scan. (The verdict
      // join-back's scan legitimately reads non-bucketed: it joins on
      // vec_id, where cid bucketing buys nothing, and Spark's
      // auto-bucketed-scan rule drops the bucketed read there.)
      def sideBucketedNoShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect { case e: ShuffleExchangeExec => e }.isEmpty &&
          p.collect {
            case f: FileSourceScanExec
                if f.tableIdentifier.exists(_.table == name) => f
          }.forall(_.bucketedScan)
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      assert(smjs.exists(j =>
          sideBucketedNoShuffle(j.left) && sideBucketedNoShuffle(j.right)),
        s"no exchange-free bucketed sort-merge pair join found:\n$plan")
      // the only hash shuffles in the plan serve the vec_id legs of the
      // verdict join-back (dup aggregate + join), never the cid pairing
      val hashKeys = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
          e.outputPartitioning.asInstanceOf[HashPartitioning]
            .expressions.flatMap(_.references.map(_.name))
      }
      assert(hashKeys.nonEmpty && hashKeys.flatten.toSet
          .subsetOf(Set("vec_id", "d2")),
        s"hash shuffles must carry only the vec_id legs, got $hashKeys:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
    }
  }

  test("a fresh session re-registers a valid on-disk index without rebuilding") {
    val name = ClusterIndex.ensure(spark, dir)
    val r1 = rows("q113_semdedup_indexed")
    val idxDir = java.nio.file.Paths.get(ClusterIndex.indexRoot, name)
    val mtimeBefore = java.nio.file.Files.getLastModifiedTime(
      idxDir.resolve("_GRAFT_FP"))
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    assert(!spark.catalog.tableExists(name))
    assert(rows("q113_semdedup_indexed") == r1)
    assert(spark.catalog.tableExists(name))
    assert(java.nio.file.Files.getLastModifiedTime(
        idxDir.resolve("_GRAFT_FP")) == mtimeBefore,
      "re-registration must not rebuild the index files")
  }
}
