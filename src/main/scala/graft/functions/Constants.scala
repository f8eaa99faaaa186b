package graft.functions

import scala.io.Source
import scala.util.Using

/** Curated domain token tables (SURVEY §7.4 risk 5): the reference keeps
  * these as 2,078 lines of Python literals (`unified_constants.py`); here
  * they are resource CSVs (diffable against the source data) loaded once
  * into immutable in-memory structures, which the Spark layer ships to
  * executors inside UDF closures / broadcast variables.
  */
object Constants {

  private def rows(name: String): List[List[String]] =
    Using.resource(Source.fromInputStream(
      getClass.getResourceAsStream(s"/graft/$name.csv"), "UTF-8")) { src =>
      src.getLines().drop(1).map(parseCsvLine).toList
    }

  // minimal CSV parse: fields are simple tokens, but values may be quoted
  // and contain commas (shared with VaccineLib)
  private[functions] def parseCsvLine(line: String): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else if (c == '"') inQ = false
        else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  private def tokenSet(name: String): Set[String] = rows(name).map(_.head).toSet
  private def strMap(name: String): Map[String, String] =
    rows(name).map(r => r.head -> r(1)).toMap
  private def multiMap(name: String): Map[String, Set[String]] =
    rows(name).map(r => r.head -> r(1).split("\\|").filter(_.nonEmpty).toSet).toMap

  lazy val stopwords: Set[String] = tokenSet("stopwords")
  lazy val saltTokens: Set[String] = tokenSet("salt_tokens")
  lazy val pureSaltCompounds: Set[String] = tokenSet("pure_salt_compounds")
  lazy val unitTokens: Set[String] = tokenSet("unit_tokens")
  lazy val saltCations: Set[String] = tokenSet("salt_cations")
  lazy val saltAnions: Set[String] = tokenSet("salt_anions")
  lazy val saltTailBreakTokens: Set[String] = tokenSet("salt_tail_break_tokens")
  lazy val garbageTokens: Set[String] = tokenSet("garbage_tokens")
  lazy val multiwordGenerics: Set[String] = tokenSet("multiword_generics")
  lazy val formModifierIgnore: Set[String] = tokenSet("form_modifier_ignore")
  lazy val connectiveWords: Set[String] = tokenSet("connective_words")
  lazy val elementDrugs: Set[String] = tokenSet("element_drugs")
  lazy val combinationAtcSuffixes: Set[String] = tokenSet("combination_atc_suffixes")

  lazy val formCanon: Map[String, String] = strMap("form_canon")
  lazy val routeCanon: Map[String, String] = strMap("route_canon")
  lazy val formToRoute: Map[String, String] = strMap("form_to_route")
  lazy val formToRoutes: Map[String, Set[String]] = multiMap("form_to_routes")
  /** FORM_TO_ROUTES in the reference's dict-insertion order — the Part-4
    * partial-key fallback (`runners.py:1224-1234`) takes the FIRST key
    * that substring-matches, so iteration order is semantic.
    */
  lazy val formToRoutesOrdered: List[(String, Set[String])] =
    rows("form_to_routes").map(r =>
      r.head -> r(1).split("\\|").filter(_.nonEmpty).toSet)
  lazy val routeSynonyms: Map[String, Set[String]] = multiMap("route_synonyms")
  lazy val routeGroups: Map[String, Set[String]] = multiMap("route_groups")
  lazy val compatibleFormPairs: List[Set[String]] =
    rows("compatible_form_pairs").map(_.head.split("\\|").toSet)
  lazy val formEquivalents: Map[String, Set[String]] = multiMap("form_equivalents")
  lazy val genericSynonyms: Map[String, String] = strMap("generic_synonyms")
  lazy val spellingSynonyms: Map[String, String] = strMap("spelling_synonyms")
  lazy val ivFluidSynonyms: Map[String, String] = strMap("iv_fluid_synonyms")
  lazy val regionalCanonical: Map[String, String] = strMap("regional_canonical")
  lazy val drugbankComponentSynonyms: Map[String, String] =
    strMap("drugbank_component_synonyms")
  lazy val allDrugSynonyms: Map[String, String] = strMap("all_drug_synonyms")

  /** groups as form -> group id (`FORM_EQUIVALENCE_GROUPS`). */
  lazy val formEquivalenceGroup: Map[String, String] =
    rows("form_equivalence_groups").map(r => r(1) -> r.head).toMap

  /** salt tokens longest-first, the greedy-scan order (D7). */
  lazy val saltTokensLongestFirst: List[String] =
    saltTokens.toList.sortBy(s => (-s.length, s))

  /** combined synonym map with the reference's layering: data-driven maps
    * first, spelling fixes, regional canon (`lookup.py` callers merge them
    * the same way).
    */
  lazy val synonymMap: Map[String, String] =
    allDrugSynonyms ++ genericSynonyms ++ ivFluidSynonyms ++
      spellingSynonyms ++ regionalCanonical

  /** REGIONAL_TO_US (`unified_constants.py:1726`): the INVERSE of the
    * regional output map — PARACETAMOL -> ACETAMINOPHEN for lookups.
    */
  lazy val regionalToUs: Map[String, String] =
    regionalCanonical.map(_.swap)

  /** The TAGGER's synonym dict (`tagger.py:209-213`): SPELLING_SYNONYMS
    * then REGIONAL_TO_US (later wins), before any table-driven synonyms
    * are merged on top by the caller. NOT the same universe as
    * [[synonymMap]]: the tagger never consults the all-drug/iv-fluid
    * maps, and the regional direction is lookup-wards.
    */
  lazy val taggerSynonyms: Map[String, String] =
    spellingSynonyms ++ regionalToUs
}
