package graft.bridge

import graft.functions.Constants

/** Part-4 generic-key expansion (`runners.py:334-409`, `:1014-1094`,
  * `:1100-1190`): the reference indexes every Annex candidate under each
  * of its clean generic components, their parenthetical-stripped bases
  * and their ALL_DRUG_SYNONYMS targets, and probes with every ESOA
  * generic component expanded through the synonym map in BOTH directions.
  * These produce the key arrays [[Part4Bridge.matchDrugCodes]] explodes.
  *
  * The ESOA-side variant map is ALL_DRUG_SYNONYMS merged with
  * table-driven entries inserted bidirectionally (`runners.py:341-360`,
  * generics_master); the ANNEX index consults only the STATIC map
  * (`runners.py:1080-1088`).
  */
object GenericKeys {

  private val DoseRx =
    "(?i)^\\d+(\\.\\d+)?\\s*(MG|ML|MCG|G|IU|%|CC|L)$".r
  private val LeadNameRx = "^([A-Z][A-Z\\s\\-]+?)(?:\\s*\\d|\\s*\\(|$)".r
  private val ParenRx = "\\s*\\([^)]*\\)"

  private def isDoseOrNumber(p: String): Boolean =
    DoseRx.matches(p) || p.replace(".", "").forall(_.isDigit)

  /** the shared pipe-split component filter: trim, upper, drop garbage /
    * short / dose / number parts (`runners.py:1104-1121`, `:1022-1035`).
    */
  private def cleanParts(genericStr: String): List[String] = {
    if (genericStr == null || genericStr.isEmpty) return Nil
    val out = List.newBuilder[String]
    for (p0 <- genericStr.split("\\|", -1)) {
      val p = p0.trim.toUpperCase
      if (p.nonEmpty && !Constants.garbageTokens.contains(p) && p.length > 2 &&
        !isDoseOrNumber(p)) out += p
    }
    out.result()
  }

  /** `extract_clean_generics` (`runners.py:1100-1122`): [[cleanParts]]
    * with keep-first dedup.
    */
  def extractCleanGenerics(genericStr: String): List[String] =
    cleanParts(genericStr).distinct

  /** `extract_generics_from_description` (`runners.py:1123-1148`): the
    * fallback when the tagger produced no generic — lead alphabetic runs
    * of each +/slash/AND-separated part.
    */
  def extractGenericsFromDescription(desc: String): List[String] = {
    if (desc == null || desc.isEmpty) return Nil
    val out = List.newBuilder[String]
    for (part <- desc.toUpperCase.split("[+/]|\\s+AND\\s+|\\s+\\+\\s+")) {
      LeadNameRx.findFirstMatchIn(part.trim).foreach { m =>
        val g = m.group(1).trim.replaceAll("\\s+", " ")
        if (g.length > 2 && !Constants.garbageTokens.contains(g)) out += g
      }
    }
    out.result()
  }

  /** The ESOA-side synonym context: ALL_DRUG_SYNONYMS plus table entries
    * inserted bidirectionally (`runners.py:341-360`; insertion pinned by
    * sorted synonym key — the reference iterates table row order, which
    * it does not document as meaningful). Build ONCE per job, not per
    * row — the reverse index costs a full map scan.
    */
  final class SynonymContext(table: Map[String, String]) extends Serializable {
    val map: Map[String, String] = {
      val m = scala.collection.mutable.LinkedHashMap[String, String](
        Constants.allDrugSynonyms.toSeq.sortBy(_._1): _*)
      for ((syn0, gen0) <- table.toList.sortBy(_._1)) {
        val (syn, gen) = (syn0.toUpperCase, gen0.toUpperCase)
        m(syn) = gen
        m(gen) = syn
      }
      m.toMap
    }
    @transient lazy val reverse: Map[String, List[String]] =
      map.toList.groupBy(_._2)
        .map { case (v, kvs) => v -> kvs.map(_._1).sorted }

    /** `get_all_name_variants`: the name, its synonym target, and every
      * synonym that maps TO it (`runners.py:363-372`).
      */
    def variants(name: String): List[String] =
      (name :: map.get(name).toList ::: reverse.getOrElse(name, Nil)).distinct
  }

  private lazy val staticContext = new SynonymContext(Map.empty)

  /** ESOA-side probe keys (`match_to_drug_code`, `runners.py:1150-1180`):
    * DRUGBANK_COMPONENT_SYNONYMS corrections on the raw string, clean
    * component extraction with the description fallback, then all name
    * variants of each component. Correction application order is pinned
    * by sorted key.
    */
  def esoaProbeKeys(genericRaw: String, description: String,
      ctx: SynonymContext = staticContext): List[String] = {
    var raw = Option(genericRaw).getOrElse("")
    for ((wrong, correct) <- Constants.drugbankComponentSynonyms.toList.sortBy(_._1))
      if (raw.toUpperCase.contains(wrong)) raw = raw.toUpperCase.replace(wrong, correct)
    val generics = extractCleanGenerics(raw) match {
      case Nil => extractGenericsFromDescription(description)
      case gs => gs
    }
    generics.flatMap(ctx.variants).distinct
  }

  /** Annex-side index keys (`runners.py:1022-1088`): each clean component
    * plus its parenthetical-stripped base, plus the STATIC
    * ALL_DRUG_SYNONYMS target of both.
    */
  def annexIndexKeys(genericRaw: String): List[String] =
    cleanParts(genericRaw).flatMap { g =>
      val base = g.replaceAll(ParenRx, "").trim
      (g :: (if (base.nonEmpty && base != g) List(base) else Nil)) :::
        Constants.allDrugSynonyms.get(g).toList :::
        (if (base.nonEmpty && base != g)
          Constants.allDrugSynonyms.get(base).toList else Nil)
    }.distinct
}
