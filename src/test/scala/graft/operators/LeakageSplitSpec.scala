package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q103 — the property the oracle hash cannot state directly: the
  * group-hashed split admits ZERO cross-boundary near-dup pairs (q59's
  * leak probe comes back empty), clusters never straddle, and the
  * remediation is non-vacuous against the doc-hashed split it replaces.
  */
class LeakageSplitSpec extends SparkSpec {

  private def split() =
    graft.SparkEntry.queries("q103_leakage_safe_split")(spark, sf0001)

  test("no near-dup group straddles the boundary; q59's probe finds zero leaks") {
    val sp = split().cache()
    try {
      // every group lands wholly on one side
      val straddlers = sp.groupBy("group_id")
        .agg(countDistinct("split").as("sides"))
        .filter(col("sides") > 1)
      assert(straddlers.count() == 0)
      // q59's leak probe, re-aimed at THIS split: an eval doc with a
      // near-dup train partner. Groups contain every pair endpoint, so
      // this must be empty by construction.
      val q59 = graft.SparkEntry.queries("q59_split_leakage")(spark, sf0001)
      val leakedUnderDocSplit = q59.filter(col("leaked")).count()
      val bySide = sp.select(col("doc_id"), col("split"))
      val edges = Dedup.minhashPairs(spark, sf0001)
      val leaked = edges
        .join(bySide.withColumnRenamed("doc_id", "d1")
          .withColumnRenamed("split", "s1"), "d1")
        .join(bySide.withColumnRenamed("doc_id", "d2")
          .withColumnRenamed("split", "s2"), "d2")
        .filter(col("s1") =!= col("s2"))
      assert(leaked.count() == 0)
      // non-vacuous: the doc-hashed split q59 audits DOES leak on the
      // same corpus — the remediation changes an outcome
      assert(leakedUnderDocSplit > 0,
        "q59 found no leaks under the doc split; corpus too clean to test")
      // both sides are populated (the 204/256 hash is on group ids)
      val sides = sp.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sides.keySet == Set("train", "eval"))
      assert(sides("train") > sides("eval"))
    } finally { sp.unpersist(); () }
  }
}
