package graft.functions

import scala.collection.mutable.ListBuffer
import scala.util.Try

/** Vaccine normalization (SURVEY §2.8 F19): canonical vaccine name +
  * detail capture (valency, strain types, groups, recombinant/attenuated,
  * pediatric/adult) and the acronym↔components bridge
  * (`unified_constants.py:1382-1438`, tables `:1245-1379`, `:1449-1714`).
  *
  * The canonical table is ORDER-SENSITIVE (first pattern hit wins — e.g.
  * "MEASLES MUMPS RUBELLA VACCINE" resolves to the entry whose pattern
  * fires first in table order), so the resource CSV carries the original
  * insertion order.
  */
object VaccineLib {

  final case class VaccineEntry(order: Int, canonical: String,
      patterns: List[String], acronym: String)

  lazy val canonicalOrdered: List[VaccineEntry] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/vaccine_canonical.csv"), "UTF-8")
    try {
      src.getLines().drop(1).map { line =>
        // proper CSV parse: pattern fields contain quoted commas
        val parts = Constants.parseCsvLine(line)
        VaccineEntry(parts(0).toInt, parts(1),
          parts(2).split("\\|").filter(_.nonEmpty).toList,
          if (parts.length > 3) parts(3) else "")
      }.toList.sortBy(_.order)
    } finally src.close()
  }

  /** acronym -> component antigens (DTP -> DIPHTHERIA|PERTUSSIS|TETANUS). */
  lazy val acronymToComponents: Map[String, List[String]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/vaccine_acronym_to_components.csv"), "UTF-8")
    try {
      src.getLines().drop(1).map { line =>
        val parts = Constants.parseCsvLine(line)
        parts(0) -> parts(1).split("\\|").filter(_.nonEmpty).toList
      }.toMap
    } finally src.close()
  }

  private val ValencyRx = "(\\d+)-?VALENT".r
  private val TypeRx = "\\(TYPE[S]?\\s+([^)]+)\\)".r
  private val GroupRx = "(?:GROUP|SEROGROUP)\\s+([A-Z,\\s\\+]+?)(?:\\s|$|\\))".r

  /** `normalize_vaccine_name` (`unified_constants.py:1382-1438`):
    * (canonical, details) or (None, None) when not a vaccine. Mirrors the
    * reference exactly, including the generic-"VACCINE" fallback that
    * keeps the residual text (double spaces and all) as the detail.
    */
  def normalizeVaccineName(text: String): (Option[String], Option[String]) = {
    if (text == null) return (None, None)
    val up = text.toUpperCase
    if (!up.contains("VACCINE") && !up.contains("TOXOID")) return (None, None)
    for (e <- canonicalOrdered; p <- e.patterns) {
      val hit = up.contains(p) ||
        Try(java.util.regex.Pattern
          .compile(p, java.util.regex.Pattern.CASE_INSENSITIVE)
          .matcher(up).find()).getOrElse(false)
      if (hit) {
        val details = ListBuffer.empty[String]
        ValencyRx.findFirstMatchIn(up).foreach(m => details += s"${m.group(1)}-valent")
        TypeRx.findFirstMatchIn(up).foreach(m => details += s"Type ${m.group(1)}")
        GroupRx.findFirstMatchIn(up).foreach(m => details += s"Group ${m.group(1).trim}")
        if (up.contains("RECOMBINANT")) details += "Recombinant"
        if (up.contains("ATTENUATED") && up.contains("LIVE")) details += "Live attenuated"
        else if (up.contains("INACTIVATED")) details += "Inactivated"
        if (up.contains("PEDIATRIC") || up.contains("JUNIOR")) details += "Pediatric"
        else if (up.contains("ADULT")) details += "Adult"
        return (Some(e.canonical),
          if (details.nonEmpty) Some(details.mkString("; ")) else None)
      }
    }
    if (up.contains("VACCINE"))
      (Some("VACCINE"), Some(up.replace("VACCINE", "").trim))
    else (None, None)
  }

  /** Expand a vaccine acronym into its component key ("DIPHTHERIA +
    * PERTUSSIS + TETANUS" style, components pre-sorted in the table).
    */
  def componentsKey(acronym: String): Option[String] =
    acronymToComponents.get(acronym.toUpperCase).map(_.mkString(" + "))

  /** keyword -> normalized component, in table order
    * (`VACCINE_COMPONENT_KEYWORDS`, `unified_constants.py:1560+`).
    */
  lazy val componentKeywords: List[(String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/vaccine_component_keywords.csv"), "UTF-8")
    try src.getLines().drop(1).map { line =>
      val p = Constants.parseCsvLine(line); p(0) -> p(1)
    }.toList finally src.close()
  }

  /** sorted "A + B" component key -> acronym
    * (`VACCINE_COMPONENTS_TO_ACRONYM`).
    */
  lazy val componentsToAcronym: Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/vaccine_components_to_acronym.csv"), "UTF-8")
    try src.getLines().drop(1).map { line =>
      val p = Constants.parseCsvLine(line); p(0) -> p(1)
    }.toMap finally src.close()
  }

  /** `normalize_vaccine_components` (`unified_constants.py:1619-1636`):
    * longest-keyword-first extraction with consumed-text removal,
    * returning the SORTED normalized component list.
    */
  def normalizeVaccineComponents(text: String): List[String] = {
    var up = text.toUpperCase
    val comps = ListBuffer.empty[String]
    for ((kw, norm) <- componentKeywords.sortBy(-_._1.length)) {
      if (up.contains(kw)) {
        if (!comps.contains(norm)) comps += norm
        up = up.replace(kw, " ")
      }
    }
    comps.toList.sorted
  }

  /** `get_vaccine_acronym` (`unified_constants.py:1658-1675`). */
  def getVaccineAcronym(components: List[String]): Option[String] =
    if (components.isEmpty) None
    else componentsToAcronym.get(
      components.map(_.toUpperCase.trim).sorted.mkString(" + "))

  /** `match_vaccine_text` (`unified_constants.py:1678-1707`): acronym as
    * a standalone word expands to the table components (table order);
    * otherwise extracted components map back to their acronym (sorted
    * order). (None, None) for non-vaccine texts.
    */
  // precompiled, longest-first: this runs once per text in the probe UDF
  private lazy val acronymRegexes: List[(String, scala.util.matching.Regex)] =
    acronymToComponents.keys.toList.sortBy(a => (-a.length, a))
      .map(a => a -> ("\\b" + java.util.regex.Pattern.quote(a) + "\\b").r)

  def matchVaccineText(text: String): (Option[String], Option[List[String]]) = {
    if (text == null) return (None, None)
    val up = text.toUpperCase
    for ((acr, rx) <- acronymRegexes)
      if (rx.findFirstIn(up).isDefined)
        return (Some(acr), Some(acronymToComponents(acr)))
    val comps = normalizeVaccineComponents(text)
    if (comps.nonEmpty) (getVaccineAcronym(comps), Some(comps))
    else (None, None)
  }
}
