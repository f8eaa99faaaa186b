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

  /** @param texts   (id, text) free-text rows
    * @param catalog (key, ...payload) normalized generic-name catalog
    * @return one row per input id: id, text, matched key + payload,
    *         match_reason in {exact, prefix, fuzzy, no_match}
    */
  def tagTexts(spark: SparkSession, texts: DataFrame, catalog: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.Config()): DataFrame = {
    val noise = nonProbeTokens
    val isNoise = udf((t: String) => noise.contains(t))
    // synonym application happens BEFORE lookup, as in the reference
    // (`lookup.py:71-94` called from the key-universe build): the
    // synonym-applied token is itself an exact-leg key, so e.g.
    // CEPHALEXIN -> CEFALEXIN matches exact, not fuzzy
    val synonymOf = udf((t: String) =>
      graft.functions.SaltLib.applySynonym(t).toLowerCase)
    val tokens = texts
      .select(col("id"), GraftFunctions.normalizeText(col("text")).as("norm"))
      .select(col("id"), posexplode(split(col("norm"), " ")))
      .toDF("id", "probe_pos", "probe")
      // generic-name candidates: alphabetic, >2 chars, not unit/form noise
      .filter(length(col("probe")) > 2 &&
        col("probe").rlike("^[a-z][a-z\\-]*$") && !isNoise(col("probe")))
    val probes = tokens
      .unionByName(tokens.withColumn("probe", synonymOf(col("probe"))))
      .dropDuplicates("id", "probe_pos", "probe")
    val best = LookupWaterfall.tag(probes, catalog, cfg)
    texts.join(best.drop("probe_pos"), Seq("id"), "left")
      .withColumn("match_reason", LookupWaterfall.reason(col("leg")))
      .drop("leg")
  }
}
