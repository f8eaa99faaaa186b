package graft.functions

/** Dose parsing / unit conversion library (SURVEY §2.8 F3–F7).
  *
  * Pure Scala port of the reference's dose semantics — two parsers coexist
  * deliberately (`dose.py` feeds PNF preparation, `tokenizer.py` feeds the
  * tagger; SURVEY §7.4 risk 6 says do NOT unify them).
  */
object DoseLib {

  /** dose struct from `dose.py:52-104` (PNF flavor). */
  sealed trait DoseStruct
  final case class AmountDose(strength: Double, unit: String) extends DoseStruct
  final case class RatioDose(strength: Double, unit: String, perVal: Double,
      perUnit: String) extends DoseStruct
  final case class PercentDose(pct: Double) extends DoseStruct

  /** one structured dose component from `tokenizer.py:183-264`. */
  final case class DoseComponent(value: Double, unit: String, unitType: String,
      valueMg: Option[Double], valueMl: Option[Double],
      concentrationMgPerMl: Option[Double])
  final case class DoseComponents(doses: List[DoseComponent],
      totalVolumeMl: Option[Double], percentages: List[Double])

  // `tokenizer.py:156-174`
  val massToMg: Map[String, Double] = Map(
    "MG" -> 1.0, "G" -> 1000.0, "GM" -> 1000.0, "GR" -> 1000.0,
    "MCG" -> 0.001, "UG" -> 0.001, "ΜG" -> 0.001, "KG" -> 1000000.0)
  val volumeToMl: Map[String, Double] = Map(
    "ML" -> 1.0, "L" -> 1000.0, "CC" -> 1.0, "DL" -> 100.0)

  /** Amount doses to mg when convertible (`dose.py:107-117`). Note the
    * reference's to_mg divides mcg by 1000 — same factor as the table.
    */
  def toMg(value: Double, unit: String): Option[Double] = unit.toLowerCase match {
    case "mg" => Some(value)
    case "g" => Some(value * 1000.0)
    case "mcg" | "ug" => Some(value / 1000.0)
    case _ => None
  }

  /** mg/mL equivalent of a ratio dose (`dose.py:132-138`). */
  def safeRatioMgPerMl(strength: Double, unit: String, perVal: Double): Option[Double] =
    toMg(strength, unit).filter(_ => perVal != 0.0).map(_ / perVal)

  /** Exact-equality dose compare with float-artifact tolerance
    * (`dose.py:196-201`): 1 g == 1000 mg passes, 450 vs 500 mg fails.
    */
  def doseEq(a: Double, b: Double): Boolean =
    math.abs(a - b) <= math.max(1e-12 * math.max(math.abs(a), math.abs(b)), 1e-9)

  // ---- dose.py parser --------------------------------------------------

  private val PackRx =
    "(?i)\\b(\\d+)\\s*(?:x|×)\\s*(\\d+(?:[.,]\\d+)?)\\s*(mg|g|mcg|ug|iu)\\b".r
  private val PerUnitWords =
    "(?:tab(?:let)?s?|cap(?:sule)?s?|sachet(?:s)?|drop(?:s)?|gtt|actuation(?:s)?|spray(?:s)?|puff(?:s)?)"
  private val AmountRx =
    "(?i)(\\d+(?:[.,]\\d+)?)\\s?(mg|g|mcg|ug|iu)\\b".r
  private val RatioMlRx =
    "(?i)(\\d+(?:[.,]\\d+)?)\\s?(mg|g|mcg|ug|iu)\\s?(?:/| per )\\s?(?:(\\d+(?:[.,]\\d+)?)\\s*)?(ml|l)\\b".r
  private val RatioNounRx =
    s"(?i)(\\d+(?:[.,]\\d+)?)\\s?(mg|g|mcg|ug|iu)\\s?(?:/| per )\\s?(1)?\\s*($PerUnitWords)\\b".r
  private val PercentRx =
    "(?i)(\\d+(?:[.,]\\d+)?)\\s?%(?:\\s?(?:w/v|w/w))?".r
  private val RatioExtraRx =
    "(?i)(\\d+(?:[.,]\\d+)?)\\s?(mg|g|mcg|ug)\\s*/\\s?(\\d+(?:[.,]\\d+)?)\\s?(ml|l)\\b".r

  private def num(s: String): Double = s.replace(",", ".").toDouble

  /** '10 x 500 mg' / '10×500 mg' -> '500mg' (`dose.py:40-48`). */
  def unmaskPackStrength(s: String): String =
    PackRx.replaceAllIn(s, m => m.group(2) + m.group(3))

  /** First-match cascade: ratio (per mL/L) -> amount -> percent -> extra
    * ratio fallback (`dose.py:51-104`). Input should be normalized text.
    */
  def parseDoseStruct(sNorm: String): Option[DoseStruct] = {
    if (sNorm == null || sNorm.isEmpty) return None
    val s = unmaskPackStrength(sNorm)
    RatioMlRx.findFirstMatchIn(s) match {
      case Some(m) =>
        val perValRaw = Option(m.group(3)).filter(_.nonEmpty).map(num).getOrElse(1.0)
        val (perVal, _) =
          if (m.group(4).toLowerCase == "l") (perValRaw * 1000.0, "ml")
          else (perValRaw, "ml")
        return Some(RatioDose(num(m.group(1)), m.group(2).toLowerCase, perVal, "ml"))
      case None =>
    }
    AmountRx.findFirstMatchIn(s) match {
      case Some(m) =>
        return Some(AmountDose(num(m.group(1)), m.group(2).toLowerCase))
      case None =>
    }
    PercentRx.findFirstMatchIn(s) match {
      case Some(m) => return Some(PercentDose(num(m.group(1))))
      case None =>
    }
    RatioExtraRx.findFirstMatchIn(s).map { m =>
      val den = if (m.group(4).toLowerCase == "l") num(m.group(3)) * 1000.0 else num(m.group(3))
      RatioDose(num(m.group(1)), m.group(2).toLowerCase, den, "ml")
    }
  }

  // ---- tokenizer.py parser --------------------------------------------

  private val StructuredDoseRx =
    ("(?i)(\\d+(?:[.,]\\d+)?)\\s*" +
      "(mg|g|gm|gr|mcg|ug|μg|kg|ml|l|cc|dl|iu|unit|units|%|pct)" +
      "(?:\\s*/\\s*(\\d+(?:[.,]\\d+)?)\\s*(ml|l|cc|dl|tab|tablet|cap|capsule|dose|unit|5ml))?").r

  /** Structured multi-dose extraction (`tokenizer.py:183-264`): classifies
    * each hit as mass/volume/percentage/iu, tracks the max volume as total
    * solution volume, derives mg/mL for X-per-Y patterns.
    */
  def parseDoseComponents(text: String): DoseComponents = {
    if (text == null) return DoseComponents(Nil, None, Nil)
    val up = text.toUpperCase
    var totalVol: Option[Double] = None
    var pcts = List.newBuilder[Double]
    val doses = StructuredDoseRx.findAllMatchIn(up).map { m =>
      val value = num(m.group(1))
      val unit0 = m.group(2).toUpperCase
      var unitType: String = null
      var valueMg: Option[Double] = None
      var valueMl: Option[Double] = None
      var conc: Option[Double] = None
      var unit = unit0
      if (unit0 == "%" || unit0 == "PCT") {
        unitType = "percentage"; unit = "%"; pcts += value
      } else if (massToMg.contains(unit0)) {
        unitType = "mass"; valueMg = Some(value * massToMg(unit0))
      } else if (volumeToMl.contains(unit0)) {
        unitType = "volume"; valueMl = Some(value * volumeToMl(unit0))
        if (totalVol.forall(valueMl.get > _)) totalVol = valueMl
      } else if (unit0 == "IU" || unit0 == "UNIT" || unit0 == "UNITS") {
        unitType = "iu"
      }
      val perValStr = Option(m.group(3))
      val perUnit0 = Option(m.group(4)).map(_.toUpperCase)
      (perValStr, perUnit0) match {
        case (Some(pv), Some(pu0)) =>
          // mg/5mL pediatric shorthand (`tokenizer.py:252-256`)
          val (perValue, perUnit) =
            if (pu0 == "5ML") (5.0, "ML") else (num(pv), pu0)
          if (volumeToMl.contains(perUnit) && valueMg.isDefined) {
            val perMl = perValue * volumeToMl(perUnit)
            if (perMl > 0) {
              conc = Some(valueMg.get / perMl)
              unitType = "concentration"
            }
          }
        case _ =>
      }
      DoseComponent(value, unit, unitType, valueMg, valueMl, conc)
    }.toList
    DoseComponents(doses, totalVol, pcts.result())
  }

  /** IV %w/v math: pct of total volume -> drug/diluent mg + mg/mL
    * (`tokenizer.py:267-327`). Rounded to 3 decimals like the reference.
    */
  final case class IvAmounts(drugAmountMg: Option[Double], drugAmountG: Option[Double],
      diluentAmountMg: Option[Double], diluentAmountG: Option[Double],
      diluentVolumeMl: Option[Double], concentrationMgPerMl: Option[Double])

  def calculateIvAmounts(drugPercentages: List[Double],
      diluentPercentage: Option[Double], totalVolumeMl: Option[Double]): IvAmounts = {
    if (totalVolumeMl.isEmpty || drugPercentages.isEmpty)
      return IvAmounts(None, None, None, None, None, None)
    val vol = totalVolumeMl.get
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val pct = drugPercentages.head
    val drugG = pct / 100.0 * vol
    val dil = diluentPercentage.map { dp =>
      val dg = dp / 100.0 * vol; (r3(dg * 1000), r3(dg))
    }
    IvAmounts(
      Some(r3(drugG * 1000)), Some(r3(drugG)),
      dil.map(_._1), dil.map(_._2),
      Some(vol), Some(r3(pct / 100.0 * 1000)))
  }

  // ---- canonical dose-string rewrites (`tokenizer.py:746-853`) ---------

  private val DoseRatioRx =
    "(?i)^(\\d+(?:\\.\\d+)?)\\s*(mg|g|mcg|ug|iu)\\s*/\\s*(\\d+(?:\\.\\d+)?)\\s*(ml|l)".r
  private val WeightRx = "(?i)^(\\d+(?:\\.\\d+)?)\\s*(g|mcg|ug)$".r

  private def fmtNum(x: Double): String =
    if (x == math.rint(x)) x.toLong.toString
    else {
      val s = f"$x%.2f".reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      s
    }

  /** "500MG/5ML" -> "100MG/ML" canonical per-1-mL form
    * (`tokenizer.py:758-806`). Returns (normalized, wasNormalized).
    */
  def normalizeDoseRatio(doseStr: String): (String, Boolean) = {
    val trimmed = doseStr.trim
    DoseRatioRx.findPrefixMatchOf(trimmed) match {
      case None => (doseStr, false)
      case Some(m) =>
        val mg = num(m.group(1)) * massToMg.getOrElse(m.group(2).toUpperCase, 1.0)
        val ml = num(m.group(3)) * volumeToMl.getOrElse(m.group(4).toUpperCase, 1.0)
        if (ml == 0) (doseStr, false)
        else (fmtNum(mg / ml) + "MG/ML", true)
    }
  }

  /** "1G" -> "1000MG", "500MCG" -> "0.5MG" (`tokenizer.py:809-853`). */
  def normalizeWeightToMg(doseStr: String): (String, Boolean) = {
    WeightRx.findPrefixMatchOf(doseStr.trim) match {
      case None => (doseStr, false)
      case Some(m) =>
        val factor = massToMg.getOrElse(m.group(2).toUpperCase, 1.0)
        if (factor == 1.0) (doseStr, false)
        else {
          val mg = num(m.group(1)) * factor
          val s =
            if (mg == math.rint(mg)) mg.toLong.toString
            else if (mg < 1) {
              val raw = mg.toString.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
              if (raw.startsWith(".")) "0" + raw else raw
            } else fmtNum(mg)
          (s + "MG", true)
        }
    }
  }
}
