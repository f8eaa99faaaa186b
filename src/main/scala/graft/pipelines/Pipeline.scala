package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Pipeline orchestration (SURVEY §2.9 C4): registry of
  * item_ref_code -> pipeline with the reference's four-hook template
  * (`base.py:65-131`, `registry.py:12-41`) and a per-phase metrics trail
  * (A9/S10: one row per phase, appended by the caller via
  * Sources.appendMetrics).
  */
trait Pipeline {
  def itemRefCode: String

  /** acquire/refresh external inputs (out-of-engine steps stay here). */
  def preRun(spark: SparkSession): Unit = {}

  /** raw inputs -> prepared DataFrame. */
  def prepareInputs(spark: SparkSession): DataFrame

  /** prepared -> matched/enriched output. */
  def matchRecords(spark: SparkSession, prepared: DataFrame): DataFrame

  /** post-processing hook (sinks, summaries). */
  def postRun(spark: SparkSession, matched: DataFrame): Unit = {}
}

final case class PhaseMetric(run_ts: Timestamp, item_ref_code: String,
    phase: String, millis: Long, rows: Long)

final class PipelineRegistry {
  private var pipelines: Map[String, Pipeline] = Map.empty

  def register(p: Pipeline): Unit = synchronized {
    pipelines += (p.itemRefCode -> p)
  }

  def get(itemRefCode: String): Option[Pipeline] = pipelines.get(itemRefCode)

  def registered: Seq[String] = pipelines.keys.toSeq.sorted

  /** Template-method run (`base.py:115-131`) returning the matched frame
    * plus per-phase timing metrics.
    *
    * The per-phase row counts are actions, so each phase frame is
    * persisted BEFORE its count: the count materializes the lineage into
    * the cache and every downstream consumer (the match phase reading
    * `prepared`, the returned frame feeding the caller's sink) reads the
    * cached blocks instead of re-executing the phase — without this the
    * metrics trail costs 2-3x the pipeline itself at scale. `prepared` is
    * unpersisted as soon as the match phase has materialized; `matched`
    * is handed to the caller still persisted (the sink is about to read
    * it) — call `unpersist()` on it when done.
    */
  def run(spark: SparkSession, itemRefCode: String): (DataFrame, Seq[PhaseMetric]) = {
    val p = pipelines.getOrElse(itemRefCode,
      throw new IllegalArgumentException(
        s"no pipeline registered for '$itemRefCode' (have: ${registered.mkString(", ")})"))
    val now = new Timestamp(System.currentTimeMillis())
    val metrics = Seq.newBuilder[PhaseMetric]
    def timed[T](phase: String, rows: T => Long)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      metrics += PhaseMetric(now, itemRefCode, phase,
        (System.nanoTime() - t0) / 1000000L, rows(out))
      out
    }
    val cachedCount: DataFrame => Long =
      df => { df.persist(StorageLevel.MEMORY_AND_DISK); df.count() }
    timed[Unit]("pre_run", _ => 0L)(p.preRun(spark))
    val prepared = timed[DataFrame]("prepare", cachedCount)(p.prepareInputs(spark))
    val matched = timed[DataFrame]("match", cachedCount)(p.matchRecords(spark, prepared))
    // A pass-through match phase returns `prepared` itself (or a frame
    // with the same analyzed plan); Spark's cache is keyed by plan, so
    // unpersisting `prepared` would ALSO evict `matched`'s cache and the
    // postRun hook plus the caller's sink would re-execute the whole
    // prepare lineage. Only unpersist when the two are genuinely
    // distinct plans.
    val passThrough = (matched eq prepared) ||
      matched.queryExecution.analyzed.sameResult(prepared.queryExecution.analyzed)
    if (!passThrough) prepared.unpersist(blocking = false)
    timed[Unit]("post_run", _ => 0L)(p.postRun(spark, matched))
    (matched, metrics.result())
  }
}
