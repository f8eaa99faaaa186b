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
      brandMap: Map[String, String] = Map.empty): DataFrame = {
    val noise = nonProbeTokens
    // The key-universe build (`tagger.py:637-699`): per text, in probe-
    // priority order — raw generic tokens (multiword extraction + stopword
    // drop via TokenLib), synonym-applied variants (`lookup.py:71-94`; so
    // CEPHALEXIN -> CEFALEXIN hits the exact leg), salt-stripped bases,
    // combination keys (G5), and the vaccine canonical name (F19). Probe
    // position encodes that priority for the ranking window.
    val probesOf = udf((text: String) => {
      import graft.functions._
      // the reference probe universe (`tagger.py:637-699`) builds from
      // extract_generic_tokens output (F14 front door), not raw tokens
      val generics0 = TokenLib.extractGenericTokens(text)._2
        .filter(t => t.length > 2 && !noise.contains(t.toLowerCase))
      // brand -> generic swap BEFORE synonym/salt processing, as in the
      // reference (swap_brand_to_generic runs in the per-text prep loop)
      val swapped = generics0.flatMap(g => brandMap.get(g.toUpperCase))
      val withSwaps = generics0 ++ swapped
      val synonyms = withSwaps.map(g => SaltLib.applySynonym(g))
      val stripped = withSwaps.map(g => SaltLib.stripSaltSuffix(g)._1)
      val combos = TokenLib.buildCombinationKeys(withSwaps)
      // mixture component key (J11): sorted '|'-joined components probe
      // catalogs keyed like unified_mixtures.component_key
      val mixtureKey = TokenLib.combinationComponents(withSwaps) match {
        case parts if parts.size >= 2 => List(parts.sorted.mkString("|"))
        case _ => Nil
      }
      val vaccine = VaccineLib.normalizeVaccineName(text)._1.toList
        .filter(_ != "VACCINE")
      // bidirectional acronym matching (`tagger.py:684-699`): the probe
      // set gains the acronym, acronym+VACCINE, each component, and the
      // sorted component combo key (+VACCINE), so DTP texts match
      // component-named catalogs and vice versa
      val (vAcr, vComps) = VaccineLib.matchVaccineText(text)
      val acrProbes = vAcr.toList.flatMap(a =>
        List(a.toUpperCase, a.toUpperCase + " VACCINE"))
      val compProbes = vComps.toList.flatMap { cs =>
        val csU = cs.map(_.toUpperCase)
        val ck = csU.sorted.mkString(" + ")
        csU ++ List(ck, ck + " VACCINE")
      }
      // probe priority (probe_pos feeds the top-1 ranking window): whole-
      // input keys first — vaccine canonical, combination keys, mixture
      // component key — then the single-generic probes and their
      // synonym/salt variants. A combination text must prefer its combo
      // catalog row over a component row at equal leg.
      (vaccine ++ acrProbes ++ compProbes ++ combos ++ mixtureKey ++
        withSwaps ++ synonyms ++ stripped)
        .map(_.toLowerCase).distinct
    })
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
      cfg: LookupWaterfall.Config = LookupWaterfall.Config(),
      brandMap: Map[String, String] = Map.empty): DataFrame = {
    val best = LookupWaterfall.tag(probeFrame(texts, cfg, brandMap), catalog, cfg)
    texts.join(best.drop("probe_pos"), Seq("id"), "left")
      .withColumn("match_reason", LookupWaterfall.reason(col("leg")))
      .drop("leg")
  }
}
