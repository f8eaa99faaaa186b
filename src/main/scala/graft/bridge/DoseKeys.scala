package graft.bridge

/** Part-4 dose keys (SURVEY §2.8 F10/F11 full fidelity): typed dose keys
  * and the zero-tolerance cross-type comparison
  * (`runners.py:725-790` get_dose_key, `:792-957` doses_match,
  * `:382-414` diluent equivalence).
  *
  * Pure Scala over an ADT — usable inside codegen-friendly UDFs and unit
  * tests; the column-level variant in [[BridgeMatcher]] covers the common
  * kinds, this is the complete semantics.
  */
object DoseKeys {

  sealed trait DoseKey
  final case class MgKey(mg: Double) extends DoseKey
  final case class IuKey(iu: Double) extends DoseKey
  final case class ComboKey(totalMg: Double) extends DoseKey
  /** unit: "mg" | "pct" | "iu" (what the concentration counts). */
  final case class ConcKey(conc: Double, vol: Option[Double], unit: String) extends DoseKey
  final case class IvKey(conc: Option[Double], diluent: String,
      vol: Option[Double]) extends DoseKey

  /** `DILUENT_EQUIVALENTS` (`runners.py:382-407`): canonical diluent
    * classes; lactated and acetated Ringer's deliberately distinct.
    */
  val diluentEquivalents: Map[String, String] = Map(
    "WATER" -> "WATER", "WATER FOR INJECTION" -> "WATER",
    "STERILE WATER" -> "WATER", "WFI" -> "WATER",
    "SODIUM CHLORIDE" -> "NORMAL_SALINE", "NORMAL SALINE" -> "NORMAL_SALINE",
    "NS" -> "NORMAL_SALINE", "0.9% SODIUM CHLORIDE" -> "NORMAL_SALINE",
    "0.9% NACL" -> "NORMAL_SALINE",
    "0.45% SODIUM CHLORIDE" -> "HALF_SALINE", "0.45% NACL" -> "HALF_SALINE",
    "HALF NORMAL SALINE" -> "HALF_SALINE",
    "LACTATED RINGER'S" -> "LACTATED_RINGERS",
    "LACTATED RINGERS" -> "LACTATED_RINGERS",
    "LR" -> "LACTATED_RINGERS", "RL" -> "LACTATED_RINGERS",
    "ACETATED RINGER'S" -> "ACETATED_RINGERS",
    "ACETATED RINGERS" -> "ACETATED_RINGERS", "AR" -> "ACETATED_RINGERS")

  def normalizeDiluent(diluent: String): Option[String] = {
    if (diluent == null || diluent.isEmpty) return None
    val d = diluent.toUpperCase.trim
    Some(diluentEquivalents.getOrElse(d, d))
  }

  /** `get_dose_key` (`runners.py:725-790`): structured columns first
    * (note the reference's Python-truthiness: a 0.0 amount falls through),
    * then the parsed dose string, then NSS/D5/D10 context inference.
    *
    * @param parsedOverride (total_mg, conc, vol_ml, unit_type) replacing
    *                       the default [[DoseStringParser.parseDoseToMg]]
    *                       call (tests inject synthetic parses here)
    */
  def getDoseKey(
      drugAmountMg: Option[Double],
      concMgPerMl: Option[Double],
      ivDiluentType: Option[String],
      totalVolumeMl: Option[Double],
      doseStr: Option[String],
      description: String = "",
      matchedGeneric: String = "",
      parsedOverride: Option[(Option[Double], Option[Double], Option[Double],
        Option[String])] = None): Option[DoseKey] = {

    if (ivDiluentType.exists(_.nonEmpty))
      return Some(IvKey(concMgPerMl,
        normalizeDiluent(ivDiluentType.get).orNull, totalVolumeMl))

    if (drugAmountMg.exists(_ != 0.0)) {
      if (concMgPerMl.exists(_ != 0.0))
        return Some(ConcKey(concMgPerMl.get, totalVolumeMl, "mg"))
      return Some(MgKey(drugAmountMg.get))
    }

    val (parsedDose, parsedConc, parsedVol, unitType) = parsedOverride.getOrElse {
      val p = DoseStringParser.parseDoseToMg(doseStr.orNull)
      (p.totalMg, p.concMgPerMl, p.volumeMl, p.unitType)
    }
    if (parsedConc.isDefined)
      return Some(ConcKey(parsedConc.get, parsedVol, unitType.orNull))
    if (parsedDose.isDefined)
      return Some(
        if (unitType.contains("iu")) IuKey(parsedDose.get)
        else MgKey(parsedDose.get))

    val desc = description.toUpperCase
    val generic = matchedGeneric.toUpperCase
    val ds = doseStr.getOrElse("")
    if (parsedVol.exists(_ > 0)) {
      val isNss = Seq("PNSS", "NSS", "PLAIN NSS", "NORMAL SALINE", "N/S")
        .exists(desc.contains) ||
        (generic.contains("SODIUM CHLORIDE") && !generic.contains("DEXTROSE"))
      if (isNss && !ds.contains("%"))
        return Some(ConcKey(9.0, parsedVol, "pct"))
      val isD5 = "\\bD5\\b".r.findFirstIn(desc).isDefined || desc.contains("5% DEXTROSE")
      if (isD5 && generic.contains("DEXTROSE") && !ds.contains("%"))
        return Some(ConcKey(50.0, parsedVol, "pct"))
      val isD10 = "\\bD10\\b".r.findFirstIn(desc).isDefined || desc.contains("10% DEXTROSE")
      if (isD10 && generic.contains("DEXTROSE") && !ds.contains("%"))
        return Some(ConcKey(100.0, parsedVol, "pct"))
    }
    None
  }

  /** `doses_match` (`runners.py:792-957`): the complete zero-tolerance
    * cross-type comparison. Branch ORDER is semantic (iv > iu-pair >
    * mg-pair > combo > conc-pair > mg×conc > iu×conc).
    */
  def dosesMatch(a: Option[DoseKey], b: Option[DoseKey]): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    (a.get, b.get) match {
      // IV solutions only match other IV solutions (exact everything;
      // volume only when both present)
      case (IvKey(ac, ad, av), IvKey(bc, bd, bv)) =>
        ac == bc && ad == bd &&
          (av.isEmpty || bv.isEmpty || av == bv)
      case (IvKey(_, _, _), _) | (_, IvKey(_, _, _)) => false

      // both simple IU: EXACT equality (reference uses ==, no tolerance)
      case (IuKey(x), IuKey(y)) => x == y

      // both mg: 0.5 absolute or 1% relative tolerance
      case (MgKey(x), MgKey(y)) =>
        val diff = math.abs(x - y)
        diff <= 0.5 || diff / math.max(math.max(x, y), 1.0) <= 0.01

      // combo vs combo/mg: totals within 0.01
      case (ComboKey(x), ComboKey(y)) => math.abs(x - y) < 0.01
      case (ComboKey(x), MgKey(y)) => math.abs(x - y) < 0.01
      case (MgKey(x), ComboKey(y)) => math.abs(x - y) < 0.01
      case (ComboKey(_), _) | (_, ComboKey(_)) => false

      // conc vs conc: unit compatibility + 0.1 abs / 1% rel; volume is
      // packaging, never compared
      case (ConcKey(ac, _, au), ConcKey(bc, _, bu)) =>
        if ((au == "iu") != (bu == "iu")) false
        else {
          val diff = math.abs(ac - bc)
          val rel = diff / math.max(math.max(ac, bc), 1.0)
          !(diff > 0.1 && rel > 0.01)
        }

      // mg vs conc: conc*vol total or conc==mg (1 mL implied); iu-conc
      // never matches mg
      case (MgKey(mg), ConcKey(c, v, u)) => mgVsConc(mg, c, v, u)
      case (ConcKey(c, v, u), MgKey(mg)) => mgVsConc(mg, c, v, u)

      // iu vs conc: only iu-typed concentrations
      case (IuKey(iu), ConcKey(c, v, u)) => iuVsConc(iu, c, v, u)
      case (ConcKey(c, v, u), IuKey(iu)) => iuVsConc(iu, c, v, u)

      case _ => false
    }
  }

  private def mgVsConc(mg: Double, conc: Double, vol: Option[Double],
      unit: String): Boolean = {
    if (unit == "iu") return false
    if (vol.exists(_ > 0) && math.abs(conc * vol.get - mg) < 0.01) return true
    math.abs(conc - mg) < 0.01
  }

  private def iuVsConc(iu: Double, conc: Double, vol: Option[Double],
      unit: String): Boolean = {
    if (unit != "iu") return false
    if (vol.exists(_ > 0) && math.abs(conc * vol.get - iu) < 0.01) return true
    math.abs(conc - iu) < 0.01
  }
}
