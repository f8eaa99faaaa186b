package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Exactly-once streaming SCD-1 upsert sink — the streaming twin of the
  * batch merge (q71, `operators/Analytic.scala`), closing the CDC loop:
  * a change stream (insert/update-delta/tombstone) continuously maintains
  * a keyed snapshot table.
  *
  * `foreachBatch` is an AT-LEAST-ONCE surface: after a crash the engine
  * re-delivers the last uncommitted micro-batch with the SAME batchId.
  * The sink turns that into exactly-once with a versioned-snapshot +
  * pointer protocol:
  *
  *   1. read the current snapshot version from the `_LATEST` pointer;
  *   2. if `latest >= batchId` the batch was already applied — SKIP
  *      (the replay no-op; with delta-accumulating changes a re-apply
  *      would visibly double-add, so idempotence is load-bearing, not
  *      cosmetic);
  *   3. else merge the collapsed batch into snapshot `v=<latest>` and
  *      write `v=<batchId>`, then atomically move the new pointer into
  *      place (temp file + ATOMIC_MOVE — rename is atomic on POSIX and
  *      HDFS; an object-store deployment swaps this one seam for a
  *      metastore/commit-log CAS, the snapshot layout is unchanged).
  *
  * Batch collapse is COMMUTATIVE per key (sum of deltas, tombstone wins,
  * name by latest event-time) so the distributed aggregation is
  * deterministic with no ordering assumption inside the micro-batch.
  *
  * At scale: the merge is ONE shuffle of snapshot + change-set on the
  * merge key per micro-batch (identical plan to q71); the change side of
  * a real CDC feed is micro-batch-sized (broadcastable); old versions are
  * reclaimed by [[vacuum]], so storage is `keep` × snapshot size.
  */
object UpsertSink {

  /** Change-stream schema: deltas accumulate, tombstones delete. */
  val changeSchema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("name", StringType),
    StructField("delta_cents", LongType),
    StructField("deleted", BooleanType),
    StructField("ts", TimestampType)))

  /** One change row per key: deltas sum, any tombstone in the batch wins
    * (order-free semantics — every per-key reduction here is commutative,
    * so task scheduling cannot change the result), name from the latest
    * event-time row.
    */
  def collapse(batch: DataFrame): DataFrame =
    batch.groupBy("key").agg(
      max_by(col("name"), col("ts")).as("name"),
      sum(col("delta_cents")).as("delta_cents"),
      max(col("deleted").cast("int")).cast("boolean").as("deleted"))

  /** Accumulating SCD-1 merge: update-by-delta where both sides match,
    * insert change-only keys at their delta, drop tombstoned keys.
    * Same full-outer single-shuffle shape as the batch merge q71.
    */
  def merge(snap: DataFrame, changes: DataFrame): DataFrame =
    snap.as("s").join(changes.as("c"), Seq("key"), "full_outer")
      .filter(col("c.deleted").isNull || !col("c.deleted"))
      .select(col("key"),
        coalesce(col("c.name"), col("s.name")).as("name"),
        (coalesce(col("s.balance_cents"), lit(0L)) +
          coalesce(col("c.delta_cents"), lit(0L))).as("balance_cents"))

  /** Version of the last applied batch, if any. */
  def latestVersion(dir: String): Option[Long] = VersionedPointer.latest(dir)

  /** Current snapshot table (empty-schema frame before the first batch). */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    latestVersion(dir) match {
      case Some(v) => spark.read.parquet(s"$dir/v=$v")
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("key", LongType),
            StructField("name", StringType),
            StructField("balance_cents", LongType))))
    }

  /** Apply one micro-batch; returns false iff skipped as already applied.
    * Streaming-internal columns are projected away so the same method
    * serves foreachBatch and direct (batch-backfill) callers.
    */
  def applyBatch(batch: DataFrame, batchId: Long, dir: String,
      epoch: Option[String] = None): Boolean = {
    if (VersionedPointer.alreadyServed(dir, batchId, epoch)) false
    else {
      val spark = batch.sparkSession
      graft.core.Lake.mkdirs(dir)
      val merged = merge(snapshot(spark, dir),
        collapse(batch.select(changeSchema.fieldNames.map(col): _*)))
      merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
      VersionedPointer.commit(dir, batchId, epoch)
      true
    }
  }

  /** Drop snapshot versions older than the `keep` most recent. The
    * pointer is the source of truth, so removing superseded versions
    * never races a reader that re-resolves the pointer — and the
    * pointer-resolved version itself is NEVER dropped: in the crash
    * window a half-committed orphan slot (v > pointer) exists, and
    * counting it against `keep` would otherwise delete the one version
    * the pointer still resolves to (every sink sharing this vacuum
    * would then fail its next read instead of replaying).
    */
  def vacuum(dir: String, keep: Int): Seq[Long] = {
    val pointer = latestVersion(dir)
    val versions = graft.core.Lake.listNames(dir)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted
    val drop = versions.dropRight(keep)
      .filter(v => !pointer.contains(v))
    drop.foreach(v => graft.core.Lake.deleteTree(s"$dir/v=$v"))
    drop
  }

  /** Attach the sink to a change stream. */
  def attach(changes: DataFrame, snapshotDir: String,
      checkpointDir: String): StreamingQuery = {
    val epoch = VersionedPointer.epochOf(checkpointDir)
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, snapshotDir, Some(epoch)); ()
      }
      .start()
  }
}
