package graft.functions

import java.util.regex.Pattern

/** F12: the master drug-detail extractor (`tokenizer.py:330-744`,
  * `extract_drug_details`) — IV-diluent recognition, leading-percent
  * relocation, a dozen ordered diluent/packaging strip rules, salt
  * parentheticals, indication qualifiers, alias capture, comma details,
  * trailing-salt strip, combo `+` spacing, structured dose extraction and
  * IV w/v amounts.
  *
  * Rule ORDER is load-bearing (SURVEY §7.4 risk 1) — this port follows the
  * reference statement-for-statement, and the spec replays a golden
  * battery generated from the original implementation. Keyword loops that
  * iterate Python sets (nondeterministic order there) iterate sorted
  * lists here; observable only if multiple keywords hit one text.
  */
object DetailsLib {

  final case class DrugDetails(
      genericName: String,
      saltDetails: Option[String],
      indicationDetails: Option[String],
      aliasDetails: Option[String],
      typeDetails: Option[String],
      releaseDetails: Option[String],
      formDetails: Option[String],
      diluentDetails: Option[String],
      ivDiluentType: Option[String],
      ivDiluentAmount: Option[String],
      doseValues: List[Double],
      doseUnits: List[String],
      doseTypes: List[String],
      totalVolumeMl: Option[Double],
      drugAmountMg: Option[Double],
      diluentAmountMg: Option[Double],
      concentrationMgPerMl: Option[Double])

  private val I = Pattern.CASE_INSENSITIVE
  private def rx(p: String): Pattern = Pattern.compile(p, I)
  private def sub(p: Pattern, s: String, repl: String): String =
    p.matcher(s).replaceAll(repl)

  private val DiluentKw =
    "diluent|solvent|reconstitution\\s+fluid|sterile\\s+water|" +
      "water\\s+for\\s+injection|w\\.?f\\.?i\\.?"

  private val IvDiluentRx = rx(
    "\\bIN\\s+" +
      "(?:(\\d+(?:\\.\\d+)?\\s*%)\\s+)?" +
      "(WATER|SODIUM\\s+CHLORIDE|LACTATED\\s+RINGER['`]?S?(?:\\s+SOLUTION)?|" +
      "ACETATED\\s+RINGER['`]?S?(?:\\s+SOLUTION)?|RINGER['`]?S?\\s+(?:SOLUTION|LACTATE))" +
      "(?:\\s+SOLUTION)?")
  private val RingerRx = rx("RINGER['`]?S?")
  private val PctStartRx = rx("^(\\d+(?:\\.\\d+)?)\\s*%\\s+(.+)$")
  private val DiluentVol1 = rx("\\+\\s*(\\d+(?:[.,]\\d+)?)\\s*(m?L)\\s*(?:" + DiluentKw + ")")
  private val DiluentVol2 = rx("\\+\\s*(\\d+(?:[.,]\\d+)?)\\s*(m?L)\\s+(?:LYOPHILIZED|FREEZE-?DRIED)\\s+POWDER\\s*\\+\\s*(?:" + DiluentKw + ")")
  private val DiluentVol3 = rx("(\\d+(?:[.,]\\d+)?)\\s*(?:mg|g|mcg|iu)\\s*/\\s*(\\d+(?:[.,]\\d+)?)\\s*(m?L)\\s*\\+\\s*(?:" + DiluentKw + ")")
  private val DiluentBare = rx("\\+\\s*(?:" + DiluentKw + ")")
  private val LyophBare = rx("(?:LYOPHILIZED|FREEZE-?DRIED)\\s+POWDER\\s*\\+\\s*(?:" + DiluentKw + ")")
  private val MonodoseDiluent = rx("\\s+(?:mono|multi)?dose\\s+vial\\s*\\+\\s*\\d+(?:[.,]\\d+)?\\s*m?L?\\s*" + DiluentKw + ".*$")
  private val LyophDiluent = rx("\\s+(?:LYOPHILIZED|FREEZE-?DRIED)\\s+POWDER\\s*\\+\\s*(?:" + DiluentKw + ").*$")
  private val MlLyoph = rx("\\s*\\+\\s*\\d+(?:[.,]\\d+)?\\s*m?L?\\s+(?:LYOPHILIZED|FREEZE-?DRIED)\\s+POWDER\\s*\\+\\s*(?:" + DiluentKw + ").*$")
  private val Diluent1a = rx("\\s*\\+\\s*\\d+(?:[.,]\\d+)?\\s*m?L?\\s+" + DiluentKw)
  private val Diluent1a2 = rx("(\\d+(?:[.,]\\d+)?\\s*(?:mg|g|mcg|iu|units?))\\s*\\+\\s*\\d+(?:[.,]\\d+)?\\s*m?L?\\s*" + DiluentKw + ".*$")
  private val Diluent1a3 = rx("\\s*\\+\\s*" + DiluentKw + "\\s+(?:SOLUTION|SUSPENSION|POWDER)?\\s*(?:VIAL|AMPULE?|BOTTLE)?.*$")
  private val Diluent1b = rx("\\s*\\+\\s*" + DiluentKw + "(?:\\s+(?:VIAL|AMPULE?|BOTTLE))?\\s*")
  private val LeftoverMl = rx("\\s*\\+\\s*\\d+(?:[.,]\\d+)?\\s*m?L?\\s*(?=\\s|$)")
  private val VaccinePotency = rx("\\s+\\d+(?:[.,]\\d+)?\\s*(?:DL|LD)(?:\\s+\\d+)?(?:\\s+(?:mouse|mice))?\\s*(?:min|minimum)?\\s*")
  private val PotencyQualifier = rx("\\s+not\\s+less\\s+than(?:\\s+\\d+(?:[.,]\\d+)?\\s*(?:PFU)?)?\\s*")
  private val FreezeDried = rx("\\s+freeze-?dried\\s+powder\\s+(?:mono|multi)?dose\\s+vial.*$")
  private val Diluent2 = rx("\\s*\\+\\s*(?:\\d+(?:[.,]\\d+)?\\s*(?:mL|g)\\s+)?" + DiluentKw)
  private val Diluent3 = rx("\\b(?:\\d+\\s+)?dose\\s*\\+\\s*(?:\\d+(?:[.,]\\d+)?\\s*m?L?\\s+)?" + DiluentKw)
  private val Diluent4 = rx("\\s+(?:PRE-?FILLED\\s+)?(?:SYRINGE\\s+)?DILUENT\\b")
  private val Packaging = rx("\\s+(?:mono|multi)?dose\\s+(?:vial|ampoule?|syringe)(?:\\s+SOLUTION\\s+(?:VIAL|AMPOULE?|BOTTLE))?\\s*$")
  private val TrailingForm = rx("\\s+(?:SOLUTION|SUSPENSION|POWDER|FREEZE-?DRIED(?:\\s+POWDER)?|LYOPHILIZED(?:\\s+POWDER)?)" +
    "(?:\\s+(?:VIAL|AMPOULE?|BOTTLE|DRUM|BAG))?\\s*$")
  private val SaltParen = rx("\\(\\s*as\\s+([^)]+)\\)")
  private val IndicationRx = rx("\\bfor\\s+(\\w+(?:\\s+\\w+){0,3}?)(?:\\s+(?:failure|conditions?|patients?))?")
  private val SolutionsFor = rx("\\bSOLUTIONS?\\s+FOR\\s+(\\w+(?:\\s+\\w+){0,3})")
  private val ParenRx = Pattern.compile("\\(([^)]+)\\)")
  private val DoseStart = rx("\\s+\\d+(?:\\.\\d+)?\\s*(?:MG|G|MCG|UG|IU|ML|L|UNITS?|%)")

  private val releaseKeywords = List(
    "EXTENDED RELEASE", "EXTENDED-RELEASE", "SUSTAINED RELEASE",
    "SUSTAINED-RELEASE", "MODIFIED RELEASE", "MODIFIED-RELEASE",
    "CONTROLLED RELEASE", "CONTROLLED-RELEASE", "DELAYED RELEASE",
    "DELAYED-RELEASE", "IMMEDIATE RELEASE", "IMMEDIATE-RELEASE",
    "LONG ACTING", "LONG-ACTING", "RETARD", "SLOW RELEASE").sorted
  private val releaseAbbrevs = Set("ER", "XR", "XL", "SR", "CR", "DR", "IR", "MR", "LA")
  private val formDetailKeywords = List(
    "FILM COATED", "FILM-COATED", "ENTERIC COATED", "ENTERIC-COATED",
    "SUGAR COATED", "SUGAR-COATED", "CHEWABLE", "DISPERSIBLE",
    "EFFERVESCENT", "SUBLINGUAL", "BUCCAL", "ORALLY DISINTEGRATING",
    "RECTAL", "VAGINAL").sorted
  private val formDetailAbbrevs = Set("FC", "EC", "ODT")

  private val trailingSaltSuffixes = List(
    "SODIUM PHOSPHATE", "DISODIUM PHOSPHATE", "SODIUM SUCCINATE",
    "SODIUM SULFATE", "SODIUM CHLORIDE", "POTASSIUM PHOSPHATE",
    "CALCIUM PHOSPHATE", "MAGNESIUM SULFATE")

  /** `_extract_type_detail_impl` (`tokenizer.py:64-89`). */
  def extractTypeDetail(text: String): (String, Option[String]) = {
    if (!text.contains(",")) return (text, None)
    val up = text.toUpperCase
    if (up.contains(" + ") || up.contains(" AND ")) return (text, None)
    val parts = text.split(",", 2)
    val base = parts(0).trim
    val afterComma = if (parts.length > 1) parts(1).trim else ""
    if (afterComma.isEmpty) return (base, None)
    val afterUpper = afterComma.toUpperCase
    val afterWords = afterUpper.split("\\s+").toSet
    if (releaseKeywords.exists(afterUpper.contains)) return (text, None)
    if (formDetailKeywords.exists(afterUpper.contains)) return (text, None)
    if ((afterWords & (formDetailAbbrevs ++ releaseAbbrevs)).nonEmpty) return (text, None)
    val formWords = Set("TABLET", "CAPSULE", "SOLUTION", "SUSPENSION",
      "INJECTION", "CREAM", "OINTMENT")
    if (formWords.exists(afterUpper.contains)) return (text, None)
    (base, Some(afterComma))
  }

  private def extractKeyworded(formText: String, keywords: List[String],
      abbrevs: Set[String]): (String, Option[String]) = {
    val formUpper = formText.toUpperCase
    val formWords = formUpper.split("\\s+").toList
    if (formText.contains(",")) {
      val parts = formText.split(",", 2)
      val base = parts(0).trim
      val afterComma = if (parts.length > 1) parts(1).trim else ""
      val afterUpper = afterComma.toUpperCase
      val afterWords = afterUpper.split("\\s+").toSet
      if (keywords.exists(afterUpper.contains)) return (base, Some(afterComma))
      if ((afterWords & abbrevs).nonEmpty) return (base, Some(afterComma))
    }
    for (kw <- keywords) {
      if (formUpper.contains(s" $kw")) {
        val idx = formUpper.indexOf(kw)
        val base = formText.substring(0, idx).trim
        val detail = formText.substring(idx).trim
        if (base.nonEmpty) return (base, Some(detail))
      }
    }
    if (formWords.length >= 2 && abbrevs.contains(formWords.last)) {
      val base = formText.split("\\s+").init.mkString(" ")
      return (base, Some(formWords.last))
    }
    formWords.find(abbrevs.contains) match {
      case Some(w) => (formText, Some(w))
      case None => (formText, None)
    }
  }

  /** `_extract_release_detail_impl` (`tokenizer.py:92-120`). */
  def extractReleaseDetail(formText: String): (String, Option[String]) =
    extractKeyworded(formText, releaseKeywords, releaseAbbrevs)

  /** `_extract_form_detail_impl` (`tokenizer.py:123-149`). */
  def extractFormDetail(formText: String): (String, Option[String]) =
    extractKeyworded(formText, formDetailKeywords, formDetailAbbrevs)

  /** The master extractor (`tokenizer.py:330-744`). */
  def extractDrugDetails(drugName: String): DrugDetails = {
    var working = drugName.trim
    var saltDetails: Option[String] = None
    var indicationDetails: Option[String] = None
    var aliasDetails: Option[String] = None
    var diluentDetails: Option[String] = None
    var ivDiluentType: Option[String] = None
    var ivDiluentAmount: Option[String] = None

    // IV diluent recognition
    val ivM = IvDiluentRx.matcher(working)
    if (ivM.find()) {
      val diluentAmount = Option(ivM.group(1))
      var diluentType = ivM.group(2).toUpperCase
      diluentType = sub(RingerRx, diluentType, "RINGER'S")
      if (!diluentType.contains("SOLUTION") &&
        (diluentType.contains("RINGER") ||
          ivM.group(0).toUpperCase.endsWith("SOLUTION"))) {
        if ((diluentType.contains("LACTATED") || diluentType.contains("ACETATED")) &&
          !diluentType.endsWith("SOLUTION"))
          diluentType = diluentType.replaceAll("\\s+$", "") + " SOLUTION"
      }
      ivDiluentType = Some(diluentType.trim)
      ivDiluentAmount = diluentAmount.map(_.trim)
    }

    // leading-% relocation
    val pctM = PctStartRx.matcher(working)
    if (pctM.matches())
      working = s"${pctM.group(2)} ${pctM.group(1)}%"

    working = working.replaceAll("\\(\\s+", "(").replaceAll("\\s+\\)", ")")

    // diluent volume capture
    val diluentVolumes = scala.collection.mutable.ListBuffer.empty[String]
    def volOf(v: String, u: String): String =
      if (u.toUpperCase == "L") s"${v.replace(",", ".")} L"
      else s"${v.replace(",", ".")} mL"
    val m1 = DiluentVol1.matcher(working)
    while (m1.find()) diluentVolumes += volOf(m1.group(1), m1.group(2))
    val m2 = DiluentVol2.matcher(working)
    while (m2.find()) diluentVolumes += volOf(m2.group(1), m2.group(2))
    val m3 = DiluentVol3.matcher(working)
    while (m3.find()) diluentVolumes += volOf(m3.group(2), m3.group(3))
    if (DiluentBare.matcher(working).find() && diluentVolumes.isEmpty)
      diluentVolumes += "with diluent"
    if (LyophBare.matcher(working).find() && diluentVolumes.isEmpty)
      diluentVolumes += "with diluent"
    if (diluentVolumes.nonEmpty)
      diluentDetails = Some(diluentVolumes.mkString("|"))

    // ordered strip cascade
    working = sub(MonodoseDiluent, working, "")
    working = sub(LyophDiluent, working, "")
    working = sub(MlLyoph, working, "")
    working = sub(Diluent1a, working, "")
    working = sub(Diluent1a2, working, "$1")
    working = sub(Diluent1a3, working, "")
    working = sub(Diluent1b, working, "")
    working = sub(LeftoverMl, working, "")
    working = sub(VaccinePotency, working, " ")
    working = sub(PotencyQualifier, working, " ")
    working = sub(FreezeDried, working, "")
    working = sub(Diluent2, working, "")
    working = sub(Diluent3, working, "")
    working = sub(Diluent4, working, "")
    working = sub(Packaging, working, "")
    working = sub(TrailingForm, working, "")

    // salt parentheticals
    val saltM = SaltParen.matcher(working)
    val salts = scala.collection.mutable.ListBuffer.empty[String]
    while (saltM.find()) salts += saltM.group(1).trim.toUpperCase
    if (salts.nonEmpty) {
      saltDetails = Some(salts.mkString("|"))
      working = sub(SaltParen, working, "")
    }

    // indication qualifiers
    val indM = IndicationRx.matcher(working)
    if (indM.find()) {
      val indication = indM.group(0).trim.toUpperCase
      if (Seq("HEPATIC", "RENAL", "INFANT", "PEDIATRIC", "IMMUNONUTRITION",
        "IMMUNOENHANCEMENT").exists(indication.contains)) {
        indicationDetails = Some(indication)
        working = working.substring(0, indM.start()) + working.substring(indM.end())
      }
    }
    val solM = SolutionsFor.matcher(working)
    if (solM.find() && indicationDetails.isEmpty) {
      indicationDetails = Some(solM.group(0).trim.toUpperCase)
      working = working.substring(0, solM.start()) + "SOLUTIONS" +
        working.substring(solM.end())
    }

    // alias parentheticals
    val parenM = ParenRx.matcher(working)
    val aliases = scala.collection.mutable.ListBuffer.empty[String]
    while (parenM.find()) {
      val parenUpper = parenM.group(1).trim.toUpperCase
      val doseLike = parenUpper.matches("^\\d+.*") ||
        Seq("MG", "ML", "MCG", "IU", "%").exists(parenUpper.contains)
      if (!doseLike && !parenUpper.startsWith("AS "))
        aliases += parenUpper
    }
    if (aliases.nonEmpty) {
      aliasDetails = Some(aliases.mkString("|"))
      for (alias <- aliases)
        working = Pattern.compile(
          "\\(\\s*" + Pattern.quote(alias) + "\\s*\\)", I)
          .matcher(working).replaceAll("")
    }

    // comma-separated details
    if (working.contains(",") && !working.contains(" + ")) {
      val parts = working.split(",", -1)
      val firstPart = parts(0).trim
      val remaining = parts.drop(1).mkString(",").trim
      val isMultiIngredient =
        rx("\\bAND\\b").matcher(remaining).find() || remaining.contains("+")
      if (!isMultiIngredient && parts.length > 1) {
        val commaDetails = parts.drop(1).map(_.trim.toUpperCase)
          .filter(_.nonEmpty).filterNot(_.matches("^\\d+.*"))
        if (commaDetails.nonEmpty) {
          aliasDetails = aliasDetails match {
            case Some(a) => Some(a + "|" + commaDetails.mkString("|"))
            case None => Some(commaDetails.mkString("|"))
          }
          working = firstPart
        }
      }
    }

    working = working.replaceAll("\\s+", " ").trim.toUpperCase

    // strip trailing dose/form runs
    val doseM = DoseStart.matcher(working)
    if (doseM.find())
      working = working.substring(0, doseM.start()).trim

    if (indicationDetails.isDefined && working.endsWith(" SOLUTIONS"))
      working = working.dropRight(10).trim
    else if (indicationDetails.isDefined && working.endsWith(" SOLUTION"))
      working = working.dropRight(9).trim

    // trailing salt strip
    trailingSaltSuffixes.find(s => working.endsWith(" " + s)).foreach { suffix =>
      val base = working.dropRight(suffix.length + 1).trim
      if (base.nonEmpty && base.length > 2) {
        saltDetails = saltDetails.map(_ + "|" + suffix).orElse(Some(suffix))
        working = base
      }
    }

    // combo + spacing
    if (working.contains("+") && !working.contains(" + "))
      working = working.replaceAll("\\+", " + ").replaceAll("\\s+", " ").trim

    val genericName =
      if (working.nonEmpty) working else drugName.trim.toUpperCase

    val (_, typeDet) = extractTypeDetail(drugName)
    val (_, releaseDet) = extractReleaseDetail(drugName)
    val formDet =
      if (releaseDet.isEmpty) extractFormDetail(drugName)._2 else None

    // structured doses + IV w/v math from the ORIGINAL text
    val doseInfo = DoseLib.parseDoseComponents(drugName)
    val (drugMg, dilMg, concMgMl) =
      if (doseInfo.percentages.nonEmpty && doseInfo.totalVolumeMl.isDefined) {
        val diluentPct = ivDiluentAmount.flatMap(a =>
          TextNorm.safeToFloat(a.replace("%", "").trim))
        val iv = DoseLib.calculateIvAmounts(
          doseInfo.percentages, diluentPct, doseInfo.totalVolumeMl)
        (iv.drugAmountMg, iv.diluentAmountMg, iv.concentrationMgPerMl)
      } else (None, None, None)

    DrugDetails(
      genericName = genericName,
      saltDetails = saltDetails,
      indicationDetails = indicationDetails,
      aliasDetails = aliasDetails,
      typeDetails = typeDet,
      releaseDetails = releaseDet,
      formDetails = formDet,
      diluentDetails = diluentDetails,
      ivDiluentType = ivDiluentType,
      ivDiluentAmount = ivDiluentAmount,
      doseValues = doseInfo.doses.map(_.value),
      doseUnits = doseInfo.doses.map(_.unit),
      doseTypes = doseInfo.doses.map(_.unitType),
      totalVolumeMl = doseInfo.totalVolumeMl,
      drugAmountMg = drugMg,
      diluentAmountMg = dilMg,
      concentrationMgPerMl = concMgMl)
  }
}
