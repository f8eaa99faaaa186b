package graft.tagger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Drug-text tagging skeleton (SURVEY §2.9 C1, second build slice §7.2):
  * normalize free text -> candidate probe tokens -> lookup waterfall
  * against a generic-name catalog -> best candidate + match_reason.
  *
  * Round-1 scope: single-token probes with textlib normalization and the
  * exact/token-prefix/fuzzy waterfall. The full reference cascade adds
  * brand-swap, synonym, combination-key and mixture legs (tagger.py:560-
  * 1030) — they slot in as additional waterfall legs over the same probe
  * frame in later rounds.
  */
object DrugTagger {

  /** tokens that can never be generic-name probes (unit/dose/form noise) —
    * subset of the reference's STOPWORDS/UNIT tokens
    * (`unified_constants.py`); grows with the constants port.
    */
  val nonProbeTokens: Set[String] = Set(
    "mg", "g", "mcg", "ug", "iu", "ml", "l", "cc", "dl", "kg", "pct",
    "tab", "tablet", "tablets", "cap", "capsule", "capsules", "syrup",
    "suspension", "solution", "injection", "vial", "ampule", "amp",
    "bottle", "sachet", "drops", "drop", "cream", "ointment", "gel",
    "intravenous", "oral", "per", "and", "with", "in", "of", "for", "as")

  /** Probe frame (id, probe_pos, probe) for a (id, text) frame — shared by
    * the leg-priority tagger below and [[ScoredTagger]].
    *
    * @param brandMap brand -> generic swaps (J10, `lookup.py:34-49`;
    *                 build side = FDA/DrugBank brand frequency ranking,
    *                 `tagger.py:233-265`) — swapped generics join the
    *                 probe set so brand-only texts resolve
    */
  def probeFrame(texts: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.Config(),
      brandMap: Map[String, String] = Map.empty,
      multiwordExtra: Set[String] = Set.empty,
      synonyms: Map[String, String] = Map.empty): DataFrame = {
    // The key-universe build (`tagger.py:637-699`) lives in
    // ScoredTagger.shapeRowOf so one extraction pass serves both probes
    // and shape; this standalone frame reuses it. Probe position encodes
    // priority (whole-input keys first) for the top-1 ranking window.
    val mw = ScoredTagger.MwDict.of(multiwordExtra)
    val syn = graft.functions.Constants.taggerSynonyms ++ synonyms
    val probesOf = udf((text: String) =>
      ScoredTagger.shapeRowOf(text, brandMap, mw, syn).probes)
    texts
      .select(col("id"), posexplode(probesOf(col("text"))))
      .toDF("id", "probe_pos", "probe")
  }

  /** @param texts   (id, text) free-text rows
    * @param catalog (key, ...payload) normalized generic-name catalog
    * @return one row per input id: id, text, matched key + payload,
    *         match_reason in {exact, prefix, fuzzy, no_match}
    */
  def tagTexts(spark: SparkSession, texts: DataFrame, catalog: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.referenceConfig,
      brandMap: Map[String, String] = Map.empty): DataFrame = {
    val best = LookupWaterfall.tag(probeFrame(texts, cfg, brandMap), catalog, cfg)
    texts.join(best.drop("probe_pos"), Seq("id"), "left")
      .withColumn("match_reason", LookupWaterfall.reason(col("leg")))
      .drop("leg")
  }
}
