package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tagger.{LookupWaterfall, ScoredTagger}

/** The drugs pipeline (C4 registration of the C1 flow, `registry.py:40`,
  * `pipelines/drugs/pipeline.py`): prepare hook supplies the (id, text)
  * frame, match runs the scored tagger against the unified catalog.
  * Part-4 bridging chains on the matched output via
  * [[graft.bridge.Part4Bridge]] (see DrugsPipelineSpec for the composed
  * golden run).
  */
final class DrugsTaggingPipeline(
    texts: SparkSession => DataFrame,
    catalog: SparkSession => DataFrame,
    cfg: LookupWaterfall.Config = LookupWaterfall.Config())
  extends Pipeline {

  val itemRefCode = "DrugsAndMedicine"

  def prepareInputs(spark: SparkSession): DataFrame = texts(spark)

  def matchRecords(spark: SparkSession, prepared: DataFrame): DataFrame =
    ScoredTagger.tagTexts(spark, prepared, catalog(spark), cfg)
}
