package graft.tagger

import graft.functions.{Constants, SaltLib}

/** Candidate scoring and selection (SURVEY §2.5 D3/D4, §2.8 F22/F23):
  * port of `scoring.py` — combination-ATC detection, ATC preference sort,
  * generic matching with synonym/subtype/combo logic, and the rule-based
  * best-candidate ranking tuple.
  */
object Scoring {

  /** one lookup candidate row (tagger catalog shape, `tagger.py:69-118`). */
  final case class Candidate(
      genericName: String,
      atcCode: String = "",
      form: String = "",
      route: String = "",
      source: String = "",
      referenceText: String = "")

  lazy val atcCombinationPatterns: List[String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/atc_combination_patterns.csv"), "UTF-8")
    try src.getLines().drop(1).toList finally src.close()
  }

  /** `is_combination_atc` (`scoring.py:42-52`): prefix-pattern table. */
  def isCombinationAtc(atc: String): Boolean =
    atc != null && atc.nonEmpty &&
      atcCombinationPatterns.exists(atc.toUpperCase.startsWith)

  /** `sort_atc_codes` (`scoring.py:55-70`): single-agent codes before
    * combinations (D4), then length, then lexical.
    */
  def sortAtcCodes(codes: Seq[String], preferSingle: Boolean = true): List[String] =
    codes.filter(c => c != null && c.nonEmpty).toList.sortBy { a =>
      val isCombo = isCombinationAtc(a)
      (if (preferSingle) isCombo else !isCombo, a.length, a)
    }

  /** `forms_are_equivalent` (`scoring.py:73-86`): missing = flexible. */
  def formsAreEquivalent(form1: String, form2: String): Boolean = {
    if (form1 == null || form1.isEmpty || form2 == null || form2.isEmpty)
      return true
    val (f1, f2) = (form1.toUpperCase, form2.toUpperCase)
    f1 == f2 || Constants.formEquivalents.getOrElse(f1, Set(f1)).contains(f2)
  }

  /** `parse_generic_with_subtype` (`scoring.py:89-105`). */
  def parseGenericWithSubtype(generic: String): (String, Option[String]) = {
    if (generic.contains(",") && !generic.contains(" + ") &&
      !generic.contains(" AND ")) {
      val parts = generic.split(",", 2)
      (parts(0).trim,
        if (parts.length > 1) Some(parts(1).trim).filter(_.nonEmpty) else None)
    } else (generic, None)
  }

  private val ComboSplit = "\\s*\\+\\s*|\\s+AND\\s+".r

  /** `generics_match` (`scoring.py:108-200`): synonym-normalized base /
    * subtype matching with combination overlap and substring fallbacks.
    * Inputs iterate in sorted order (the reference inherits Python set
    * order) — observable only with multiple conflicting inputs.
    */
  def genericsMatch(inputGenerics: Set[String], candidateGeneric: String,
      applySyn: String => String = g => SaltLib.applySynonym(g)): (Boolean, String) = {
    if (inputGenerics.isEmpty || candidateGeneric == null ||
      candidateGeneric.isEmpty) return (false, "missing_generic")

    val candUpper = candidateGeneric.toUpperCase
    val candNormalized = applySyn(candUpper)
    val (candBase, candSubtype) = parseGenericWithSubtype(candUpper)
    val candBaseNormalized = applySyn(candBase)
    val candIsCombo = candUpper.contains(" + ") || candUpper.contains(" AND ")

    if (candIsCombo) {
      val candParts = ComboSplit.split(candUpper).map(_.trim).filter(_.nonEmpty).toSet
      val candPartsNormalized = candParts.map(applySyn)
      val inputNormalized = inputGenerics.map(applySyn)
      if ((inputNormalized & candPartsNormalized).nonEmpty)
        return (true, "combo_match")
      for (inp <- inputNormalized.toList.sorted; cp <- candPartsNormalized.toList.sorted)
        if (cp.contains(inp) || inp.contains(cp)) return (true, "combo_partial")
      (false, "combo_no_match")
    } else {
      for (inp <- inputGenerics.toList.sorted) {
        val inpNormalized = applySyn(inp)
        val (inpBase, inpSubtype) = parseGenericWithSubtype(inp)
        val inpBaseNormalized = applySyn(inpBase)
        val baseMatches =
          inpBaseNormalized == candBaseNormalized ||
            inpBaseNormalized == candBase ||
            candBaseNormalized.contains(inpBaseNormalized) ||
            inpBaseNormalized.contains(candBaseNormalized) ||
            candBase.contains(inpBase) ||
            inpBase.contains(candBase)
        if (baseMatches) {
          inpSubtype match {
            case Some(st) =>
              candSubtype match {
                case Some(cst)
                    if cst.toUpperCase.contains(st.toUpperCase) ||
                      st.toUpperCase.contains(cst.toUpperCase) =>
                  return (true, "exact_with_subtype")
                case _ => // subtype missing or mismatched: try next input
              }
            case None =>
              if (inpNormalized == candNormalized || inpNormalized == candUpper)
                return (true, "exact")
              return (true, "substring")
          }
        }
      }
      (false, "no_match")
    }
  }

  /** `select_best_candidate` (`scoring.py:203-387`): generic-match filter
    * (with IV active-over-vehicle and combo-requires-combo rules), then
    * the lexicographic rank tuple (match type, ATC preference, form
    * equivalence, details score, name length, ATC) — D3. Sort is stable,
    * so ties keep candidate input order, as in the reference.
    */
  def selectBestCandidate(
      candidates: List[Candidate],
      inputForms: Set[String],
      inputGenericsNormalized: Set[String],
      isSingleDrug: Boolean,
      isCombination: Boolean,
      isIvSolution: Boolean,
      strippedGenerics: List[String],
      inputDetails: Map[String, String] = Map.empty,
      applySyn: String => String = g => SaltLib.applySynonym(g)): Option[Candidate] = {

    val valid = candidates.flatMap { cand =>
      val candGeneric = cand.genericName.toUpperCase
      val (matches, reason) =
        genericsMatch(inputGenericsNormalized, candGeneric, applySyn)
      if (!matches) None
      else {
        val vehicleSkip =
          if (isIvSolution && strippedGenerics.length > 1) {
            val active = applySyn(strippedGenerics.head.toUpperCase)
            val vehicle = applySyn(strippedGenerics(1).toUpperCase)
            val candNorm = applySyn(candGeneric)
            val isVehicle = candGeneric.contains(vehicle) ||
              vehicle.contains(candGeneric) || vehicle == candNorm
            val isActive = candGeneric.contains(active) ||
              active.contains(candGeneric) || active == candNorm
            isVehicle && !isActive
          } else false
        val candIsCombo =
          candGeneric.contains(" + ") || candGeneric.contains(" AND ")
        if (vehicleSkip || (isCombination && !candIsCombo)) None
        else Some((cand, reason))
      }
    }

    if (valid.isEmpty) return None
    if (valid.length == 1) return Some(valid.head._1)

    def det(k: String): String = inputDetails.getOrElse(k, "").toUpperCase
    val inputType = det("type_details")
    val inputRelease = det("release_details")
    val inputFormDet = det("form_details")
    val inputIndication = det("indication_details")
    val inputSalt = det("salt_details")
    val inputBrand = det("brand_details")
    val inputAlias = det("alias_details")
    val inputIvType = det("iv_diluent_type")

    def rank(item: (Candidate, String)): (Int, Int, Int, Int, Int, String) = {
      val (cand, reason) = item
      val candGeneric = cand.genericName.toUpperCase
      val candRef = cand.referenceText.toUpperCase
      val candForm = cand.form.toUpperCase
      val matchPriority = reason match {
        case "exact" | "exact_with_subtype" => 0
        case "combo_match" => 1
        case "substring" => 2
        case "combo_partial" => 3
        case _ => 4
      }
      val comboAtc = isCombinationAtc(cand.atcCode)
      val atcPriority =
        if (isSingleDrug) { if (comboAtc) 1 else 0 }
        else if (isCombination) { if (comboAtc) 0 else 1 }
        else 0
      val formPriority =
        if (inputForms.isEmpty) 0
        else if (inputForms.contains(candForm)) 0
        else if (inputForms.exists(formsAreEquivalent(candForm, _))) 1
        else 2
      var detailsScore = 0
      def hit(d: String): Boolean =
        d.nonEmpty && (candRef.contains(d) || candGeneric.contains(d))
      if (hit(inputRelease)) detailsScore -= 10
      if (hit(inputType)) detailsScore -= 5
      if (hit(inputFormDet)) detailsScore -= 5
      if (hit(inputIndication)) detailsScore -= 5
      if (hit(inputSalt)) detailsScore -= 3
      if (inputBrand.nonEmpty && candRef.contains(inputBrand)) detailsScore -= 1
      if (hit(inputAlias)) detailsScore -= 2
      if (hit(inputIvType)) detailsScore -= 5
      (matchPriority, atcPriority, formPriority, detailsScore,
        -candGeneric.length, cand.atcCode)
    }

    Some(valid.sortBy(rank).head._1)
  }
}
