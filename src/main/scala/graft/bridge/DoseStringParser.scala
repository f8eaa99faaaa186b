package graft.bridge

import java.util.regex.Pattern

/** Part-4 dose-string parsing (SURVEY §2.8 F8/F9): the 10-pattern cascade
  * turning free-form dose strings ("40MG", "250MG/5ML 60ML", "200 000 IU",
  * "0.9%", Annex pipe formats "400|MG|57|ML|35") into
  * (total_mg, concentration_mg_per_ml, volume_ml, unit_type), plus the
  * combination-dose parser ("500MG+125MG", "250|MG|125", vial-size
  * disambiguation "250|MG|1|G").
  *
  * Statement-for-statement port of `runners.py:546-723` (parse_dose_to_mg)
  * and `:428-544` (parse_combo_dose); pattern ORDER and the quirks
  * (9% -> 0.9% saline fix, bare-number-as-mg 0.1–10000 heuristic,
  * last-volume-wins bottle size) are semantics, not accidents.
  */
object DoseStringParser {

  final case class ParsedDose(totalMg: Option[Double],
      concMgPerMl: Option[Double], volumeMl: Option[Double],
      unitType: Option[String])

  val unitToMg: Map[String, Double] = Map(
    "MG" -> 1.0, "G" -> 1000.0, "GM" -> 1000.0, "GRAM" -> 1000.0,
    "MCG" -> 0.001, "UG" -> 0.001, "MICROGRAM" -> 0.001, "KG" -> 1000000.0)

  private def rx(p: String) = Pattern.compile(p)

  private val ConcSkip = rx("\\d+\\s*(MG|G|MCG)?\\s*/\\s*\\d*\\s*M?L\\b")
  private val PlusCombo = rx("(\\d+(?:\\.\\d+)?)\\s*(MG|G|MCG)\\s*\\+\\s*(\\d+(?:\\.\\d+)?)\\s*(MG|G|MCG)?")
  private val SlashCombo = rx("^(\\d+(?:\\.\\d+)?)\\s*(MG|G|MCG)\\s*/\\s*(\\d+(?:\\.\\d+)?)\\s*(MG|G|MCG)$")
  private val NumOnly = rx("^\\d+(?:\\.\\d+)?$")
  private val IuConc = rx("(\\d+(?:\\.\\d+)?)\\s*I\\.?U\\.?\\s*/\\s*(ML|L)")
  private val IuDoseVol = rx("(\\d+(?:\\.\\d+)?)\\s*I\\.?U\\.?\\s*/\\s*(\\d+(?:\\.\\d+)?)\\s*(ML|L)")
  private val IuSimple = rx("(\\d+(?:\\.\\d+)?)\\s*I\\.?U\\.?\\b")
  private val MassConc = rx("(\\d+(?:\\.\\d+)?)\\s*(MG|G|MCG|UG)/\\s*(ML|L)")
  private val DoseVol = rx("(\\d+(?:\\.\\d+)?)\\s*(MG|G|MCG|UG)\\s*/\\s*(\\d+(?:\\.\\d+)?)\\s*(ML|L)")
  private val Bottle = rx("(\\d+(?:\\.\\d+)?)\\s*(ML|L)\\b")
  private val SimpleDose = rx("(\\d+(?:\\.\\d+)?)\\s*(MG|G|GM|GRAM|MCG|UG|MICROGRAM)\\b")
  private val AnnexDose = rx("^(\\d+(?:\\.\\d+)?)\\s+(MG|G|MCG|UG)\\s*$")
  private val BareDose = rx("^(\\d+(?:\\.\\d+)?)\\s*(?:$|[^A-Z0-9]|TAB|CAP|TABLET|CAPSULE)")
  private val AnyVol = rx("(\\d+(?:\\.\\d+)?)\\s*(ML|L|CC)\\b")
  private val Percent = rx("(\\d*\\.?\\d+)\\s*%")
  private val DigitGap = rx("(\\d)\\s+(\\d)")

  /** `parse_combo_dose` (`runners.py:428-544`):
    * (component_doses_mg, total_mg, bottle_vol) or nulls.
    */
  def parseComboDose(doseStr0: String): (Option[List[Double]], Option[Double], Option[Double]) = {
    if (doseStr0 == null) return (None, None, None)
    val doseStr = doseStr0.toUpperCase.trim
    if (doseStr.isEmpty) return (None, None, None)
    if (ConcSkip.matcher(doseStr).find()) return (None, None, None)

    // "500MG+125MG"
    val plusM = PlusCombo.matcher(doseStr)
    val components = scala.collection.mutable.ListBuffer.empty[Double]
    while (plusM.find()) {
      val unit1 = plusM.group(2)
      val unit2 = Option(plusM.group(4)).getOrElse(unit1)
      components += plusM.group(1).toDouble * unitToMg.getOrElse(unit1, 1.0)
      components += plusM.group(3).toDouble * unitToMg.getOrElse(unit2, 1.0)
    }
    if (components.nonEmpty)
      return (Some(components.toList), Some(components.sum), None)

    // "500MG/125MG"
    val slashM = SlashCombo.matcher(doseStr)
    if (slashM.matches()) {
      val mg1 = slashM.group(1).toDouble * unitToMg.getOrElse(slashM.group(2), 1.0)
      val mg2 = slashM.group(3).toDouble * unitToMg.getOrElse(slashM.group(4), 1.0)
      return (Some(List(mg1, mg2)), Some(mg1 + mg2), None)
    }

    // Annex pipe format walk: "250|MG|125", "400|MG|57|ML|35", vial-size
    // disambiguation "250|MG|1|G"
    val parts = doseStr.replace(" ", "").split("\\|", -1)
    val doses = scala.collection.mutable.ListBuffer.empty[Double]
    var bottleVol: Option[Double] = None
    var lastWasDose = false
    var lastUnit: String = null
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      var advanced = false
      if (NumOnly.matcher(part).matches()) {
        val num = part.toDouble
        if (i + 1 < parts.length) {
          val next = parts(i + 1)
          if (next == "MG" || next == "G" || next == "MCG") {
            if (lastUnit == "MG" && next == "G" && num <= 10) {
              i += 2; advanced = true // vial size, not a second dose
            } else {
              doses += num * unitToMg.getOrElse(next, 1.0)
              lastWasDose = true; lastUnit = next
              i += 2; advanced = true
            }
          } else if (next == "ML") {
            if (lastWasDose && num < 1000) {
              doses += num // second dose component, assume MG
              lastWasDose = true
              i += 2; advanced = true
            } else {
              bottleVol = Some(num)
              lastWasDose = false
              i += 2; advanced = true
            }
          }
        }
        if (!advanced && i > 0 &&
          (parts(i - 1) == "MG" || parts(i - 1) == "G" || parts(i - 1) == "MCG")) {
          if (i + 1 < parts.length && parts(i + 1) == "G") {
            i += 2; advanced = true // skip vial size
          } else {
            doses += num
            lastWasDose = true
            i += 1; advanced = true
          }
        }
      } else {
        lastWasDose = false; lastUnit = null
      }
      if (!advanced) i += 1
    }
    if (doses.length >= 2) (Some(doses.toList), Some(doses.sum), bottleVol)
    else (None, None, None)
  }

  private val ComboGenericSplit = "\\s*\\+\\s*|\\s+AND\\s+".r

  /** Per-generic combo-dose attribution: positionally zip a combination
    * generic's components with [[parseComboDose]]'s component doses —
    * combo dose strings list amounts in the generic's component order
    * (CO-AMOXICLAV "AMOXICILLIN + CLAVULANIC ACID" with "400|MG|57|ML|35"
    * -> AMOXICILLIN 400 mg, CLAVULANIC ACID 57 mg per 5 mL). Components
    * beyond the shorter list are dropped (a trailing vial size never
    * reaches here — the parser's vial-size disambiguation already
    * excluded it, `runners.py:481-536`). Empty when the dose string is
    * not a combo or the generic has fewer than two components.
    */
  def associateComponentDoses(genericKey: String,
      doseStr: String): List[(String, Double)] = {
    if (genericKey == null) return Nil
    val comps = ComboGenericSplit.split(genericKey.toUpperCase)
      .map(_.trim).filter(_.nonEmpty).toList
    if (comps.length < 2) return Nil
    parseComboDose(doseStr)._1 match {
      case Some(doses) => comps.zip(doses)
      case None => Nil
    }
  }

  /** `parse_dose_to_mg` (`runners.py:546-723`). */
  def parseDoseToMg(doseStr0: String): ParsedDose = {
    if (doseStr0 == null) return ParsedDose(None, None, None, None)
    var doseStr = doseStr0.toUpperCase.trim
    if (doseStr.isEmpty) return ParsedDose(None, None, None, None)

    val (_, comboTotal, comboVol) = parseComboDose(doseStr)
    if (comboTotal.isDefined)
      return ParsedDose(comboTotal, None, comboVol, Some("combo"))

    doseStr = doseStr.replace("|", " ")
    doseStr = doseStr.replaceAll("\\s+", " ")
    doseStr = DigitGap.matcher(doseStr).replaceAll("$1$2") // "200 000" -> "200000"

    var totalDose: Option[Double] = None
    var concentration: Option[Double] = None
    var volumeMl: Option[Double] = None
    var unitType: Option[String] = None

    // Pattern 0: "1000IU/ML"
    val iuConcM = IuConc.matcher(doseStr)
    if (iuConcM.find()) {
      val v = iuConcM.group(1).toDouble
      concentration = Some(if (iuConcM.group(2) == "L") v / 1000.0 else v)
      unitType = Some("iu")
    }
    // Pattern 0b: "1000IU/5ML" (unconditional, may override 0)
    val iuDvM = IuDoseVol.matcher(doseStr)
    if (iuDvM.find()) {
      totalDose = Some(iuDvM.group(1).toDouble)
      val volVal = iuDvM.group(2).toDouble
      volumeMl = Some(if (iuDvM.group(3) == "L") volVal * 1000.0 else volVal)
      if (volumeMl.exists(_ > 0))
        concentration = Some(totalDose.get / volumeMl.get)
      unitType = Some("iu")
    }
    // Pattern 0c: simple IU
    if (unitType.isEmpty) {
      val iuM = IuSimple.matcher(doseStr)
      if (iuM.find()) {
        totalDose = Some(iuM.group(1).toDouble)
        unitType = Some("iu")
      }
    }
    // Pattern 1: "100MG/ML"
    if (unitType.isEmpty) {
      val cM = MassConc.matcher(doseStr)
      if (cM.find()) {
        val mgVal = cM.group(1).toDouble * unitToMg.getOrElse(cM.group(2), 1.0)
        concentration = Some(if (cM.group(3) == "L") mgVal / 1000.0 else mgVal)
        unitType = Some("mg")
      }
    }
    // Pattern 2: "300MG/2ML" (+ separate bottle volume "250MG/5ML 60ML")
    if (unitType.isEmpty || unitType.contains("mg")) {
      val dvM = DoseVol.matcher(doseStr)
      if (dvM.find()) {
        totalDose = Some(dvM.group(1).toDouble * unitToMg.getOrElse(dvM.group(2), 1.0))
        val volVal = dvM.group(3).toDouble
        val denomVol = if (dvM.group(4) == "L") volVal * 1000.0 else volVal
        if (denomVol > 0) concentration = Some(totalDose.get / denomVol)
        unitType = Some("mg")
        val after = doseStr.substring(dvM.end())
        val bM = Bottle.matcher(after)
        if (bM.find()) {
          val bv = bM.group(1).toDouble
          volumeMl = Some(if (bM.group(2) == "L") bv * 1000.0 else bv)
        } else volumeMl = Some(denomVol)
      }
    }
    // Pattern 3: simple "40MG" / "1GM"
    if (totalDose.isEmpty && concentration.isEmpty && unitType.isEmpty) {
      val sM = SimpleDose.matcher(doseStr)
      if (sM.find()) {
        totalDose = Some(sM.group(1).toDouble * unitToMg.getOrElse(sM.group(2), 1.0))
        unitType = Some("mg")
      }
    }
    // Pattern 3b: Annex "200 MG" exact
    if (totalDose.isEmpty && concentration.isEmpty && unitType.isEmpty) {
      val aM = AnnexDose.matcher(doseStr)
      if (aM.matches()) {
        totalDose = Some(aM.group(1).toDouble * unitToMg.getOrElse(aM.group(2), 1.0))
        unitType = Some("mg")
      }
    }
    // Pattern 3c: bare number as mg (0.1–10000 heuristic)
    if (totalDose.isEmpty && concentration.isEmpty && unitType.isEmpty) {
      val bM = BareDose.matcher(doseStr)
      if (bM.lookingAt()) {
        val v = bM.group(1).toDouble
        if (v >= 0.1 && v <= 10000) {
          totalDose = Some(v)
          unitType = Some("mg")
        }
      }
    }
    // Pattern 4: standalone volume, LAST one wins (bottle size)
    if (volumeMl.isEmpty) {
      val vM = AnyVol.matcher(doseStr)
      var last: Option[(Double, String)] = None
      while (vM.find()) last = Some((vM.group(1).toDouble, vM.group(2)))
      last.foreach { case (v, u) =>
        volumeMl = Some(if (u == "L") v * 1000.0 else v)
      }
    }
    // Pattern 5: percent -> mg/mL (w/v), with the 9% -> 0.9% saline fix
    if (totalDose.isEmpty && concentration.isEmpty && unitType.isEmpty) {
      val pM = Percent.matcher(doseStr)
      if (pM.find()) {
        var pct = pM.group(1).toDouble
        if (pct == 9) pct = 0.9
        concentration = Some(pct * 10.0)
        unitType = Some("pct")
      }
    }
    ParsedDose(totalDose, concentration, volumeMl, unitType)
  }
}
