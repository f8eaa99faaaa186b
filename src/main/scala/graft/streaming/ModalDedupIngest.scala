package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.ClusterIndex

/** The ONE per-micro-batch ingest-dedup body behind the image
  * (surface 20) and audio (surface 22) sinks — NOT a surface itself,
  * the [[VersionedPointer]] discipline at the batch-application layer:
  * featurize the raw payloads (the modality's only seam), assign to
  * the generation's FROZEN learned cells, prune arrivals that
  * near-duplicate an already-ADMITTED same-cell row (cosine ≥ 0.3,
  * q104's rule via [[graft.operators.ClusterIndex.probeVerdicts]]),
  * log the verdicts, append admitted representatives. Because both
  * sinks run THIS body and the q125/q127 maintenance loops run the
  * same assign/probe functions, the DuckDB oracles gating those loops
  * certify both sinks by proxy — and the image/audio ingest semantics
  * cannot drift from each other by construction.
  *
  * Exactly-once is [[ClusterIndexSink]]'s seam verbatim: the index
  * append and the log commit cannot be atomic together, so the probe
  * excludes the batch's own ids from the history leg (idempotent
  * under replay-after-append), the history dup-check reduces through
  * a grouped min, and the log commits under the versioned-pointer
  * protocol with the checkpoint-epoch guard.
  *
  * The 100-TB shape: per batch one decode pass (O(batch), codec init
  * amortized per partition), one broadcast K-row assignment, and one
  * cid-keyed join that shuffles the BATCH side only — the admitted
  * history is read bucketed from the persisted index, never rebuilt.
  */
private[streaming] object ModalDedupIngest {

  /** All committed verdicts (vec_id, cid, dup_of, kept, batch_id). */
  def verdicts(spark: SparkSession, dir: String): DataFrame = {
    val dirs = VersionedPointer.committedDirs(dir)
    if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("vec_id", LongType),
          StructField("cid", LongType),
          StructField("dup_of", LongType),
          StructField("kept", BooleanType),
          StructField("batch_id", LongType))))
  }

  /** Apply one featurized micro-batch; false iff already applied.
    * `featurize` maps the raw (vec_id, payload) rows to the modality's
    * feature frame; `assignB` is the modality's frozen-cell assignment
    * ([[graft.operators.ClusterIndex.assignImageBatch]] /
    * [[graft.operators.ClusterIndex.assignAudioBatch]]).
    */
  def applyBatch(batch: DataFrame, batchId: Long, indexName: String,
      centroids: DataFrame, outDir: String, epoch: Option[String],
      featurize: DataFrame => DataFrame,
      assignB: (DataFrame, DataFrame) => DataFrame): Boolean = {
    if (VersionedPointer.alreadyServed(outDir, batchId, epoch)) false
    else {
      val spark = batch.sparkSession
      graft.core.Lake.mkdirs(outDir)
      val b = assignB(featurize(batch), centroids).localCheckpoint(true)
      // exclusion on: a crashed previous attempt may have appended this
      // batch's own rows (the ClusterIndexSink replay seam, by vec_id)
      val out = ClusterIndex.probeVerdicts(spark, indexName, b,
          excludeBatchFromHistory = true)
        .withColumn("batch_id", lit(batchId))
        .localCheckpoint(true)
      ClusterIndex.append(spark, indexName,
        b.join(out.filter(col("kept")).select("vec_id"), "vec_id"))
      out.write.mode("overwrite").parquet(s"$outDir/v=$batchId")
      b.unpersist()
      out.unpersist()
      VersionedPointer.commit(outDir, batchId, epoch)
      true
    }
  }

  /** Attach `apply(batch, batchId, epoch)` to a payload stream under
    * the checkpoint-epoch guard.
    */
  def attach(rows: DataFrame, checkpointDir: String)(
      apply: (DataFrame, Long, Option[String]) => Boolean): StreamingQuery = {
    val epoch = VersionedPointer.epochOf(checkpointDir)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        apply(batch, batchId, Some(epoch)); ()
      }
      .start()
  }
}
