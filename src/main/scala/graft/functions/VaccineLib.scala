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
}
