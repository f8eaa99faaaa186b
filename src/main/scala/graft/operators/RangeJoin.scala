package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Bucketed range join: probe rows land in irregular, overlapping value
  * intervals without a nested-loop join.
  *
  * Spark executes a bare non-equi join (`price >= lo AND price < hi`) as
  * BroadcastNestedLoopJoin — O(|probe| x |intervals|) comparisons, the plan
  * that dies first at 100 TB. The scale form decomposes each interval into
  * the fixed-width buckets it covers (a generator over the SMALL side
  * only), computes each probe row's single bucket arithmetically, and
  * equi-joins on the bucket key with the residual `[lo, hi)` predicate as a
  * post-join filter. Cost: O(|probe|) bucket probes against a broadcast
  * index of |intervals| x (interval_width / bucket_width) entries. No
  * dedup step is needed: a probe row has exactly ONE bucket and an
  * interval covers that bucket at most once, so each qualifying
  * (row, interval) pair is produced exactly once.
  *
  * The interval dimension is derived deterministically from `nation`
  * (25 irregular price bands over l_extendedprice, widths 3000–13000 vs
  * spacing 4000 — some bands overlap, some leave gaps, exercising both
  * multi-match and no-match rows). The oracle states the same query as the
  * naive inequality join, so the hash comparison proves the decomposition
  * is exactly the non-equi-join semantics; RangeJoinSpec additionally pins
  * the physical plan (BroadcastHashJoin present, no BNLJ/cartesian) and
  * re-proves equivalence against Spark's own nested-loop form at sf0.001.
  */
object RangeJoin {

  /** Bucket width for the decomposition. Chosen at the interval spacing
    * scale: each interval covers ceil(width/4000)+1 <= 5 buckets, so the
    * exploded index stays tiny (<= ~125 rows) while a probe bucket meets
    * only the handful of intervals that can actually contain it.
    */
  private val BucketW = 4000.0

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q63_range_join",
      (s, dir) => {
        val iv = Tables(s, dir, "nation").select(
          col("n_nationkey").as("interval_id"),
          (lit(900.0) + col("n_nationkey") * 4000.0).as("lo"),
          (lit(900.0) + col("n_nationkey") * 4000.0 + 3000.0 +
            (col("n_nationkey") % 5) * 2500.0).as("hi"))
        // every bucket the interval [lo, hi) touches; hi's own bucket is
        // kept even when hi sits on a boundary — rows there fail the
        // residual predicate, correctness never depends on the edge
        val index = iv.withColumn("bucket",
          explode(sequence(
            floor(col("lo") / BucketW).cast("long"),
            floor(col("hi") / BucketW).cast("long"))))
        val probe = Tables(s, dir, "lineitem")
          .select(col("l_extendedprice").as("price"))
          .withColumn("bucket", floor(col("price") / BucketW).cast("long"))
        probe
          .join(broadcast(index), "bucket")
          .where(col("price") >= col("lo") && col("price") < col("hi"))
          .groupBy("interval_id")
          .agg(
            count(lit(1)).as("n_items"),
            sum(round(col("price") * 100).cast("long")).as("sum_price_cents"))
          .orderBy("interval_id")
      },
      Some("""WITH iv AS (
             |  SELECT n_nationkey AS interval_id,
             |    900.0 + n_nationkey * 4000.0 AS lo,
             |    900.0 + n_nationkey * 4000.0 + 3000.0
             |      + (n_nationkey % 5) * 2500.0 AS hi
             |  FROM nation)
             |SELECT iv.interval_id, count(*) AS n_items,
             |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             |       AS BIGINT) AS sum_price_cents
             |FROM iv JOIN lineitem l
             |  ON l.l_extendedprice >= iv.lo AND l.l_extendedprice < iv.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
