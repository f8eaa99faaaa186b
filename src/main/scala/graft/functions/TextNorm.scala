package graft.functions

import java.text.Normalizer

/** Text normalization library (SURVEY §2.8 F1/F2/F23/F24).
  *
  * Pure Scala functions over String — usable driver-side, inside UDFs, and
  * unit-testable without a SparkSession. Rule order is load-bearing and
  * mirrors the reference exactly (`text_utils.py:49-65`): e.g. the
  * standalone-token guard on gm→g exists so "NEOSTIGMINE" never becomes
  * "NEOSTIGINE" (`tests/test_annex_f_normalization_stigmine.py:19-37`).
  */
object TextNorm {

  private val GmToken = "(?<![a-z])gms?(?![a-z])".r
  private val CcToken = "(?<![a-z])cc(?![a-z])".r
  private val IvToken = "(?U)\\biv\\b".r
  // Python \w is unicode-aware; Java needs (?U) for parity.
  private val NonWord = "(?U)[^\\w%/+.\\- ]+".r
  private val Ws = "\\s+".r

  /** Restrict gm/gms collapsing to standalone unit tokens
    * (`text_utils.py:26-28`).
    */
  def normalizeUnitTokens(s: String): String = GmToken.replaceAllIn(s, "g")

  /** Canonical normalized text used for matching and parsing
    * (`text_utils.py:49-65`). NFKD-fold accents, lowercase, expand
    * iv->intravenous, strip non-word punctuation (keeping %/+.-), unit
    * canonicalization (microgram/μg->mcg, cc->ml, gm->g standalone-only,
    * milligram->mg), known typo fixes, whitespace collapse.
    */
  def normalizeText(s: String): String = {
    if (s == null) return ""
    var x = Normalizer.normalize(s, Normalizer.Form.NFKD)
    x = x.filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK ||
      Character.getType(c) == Character.COMBINING_SPACING_MARK ||
      Character.getType(c) == Character.ENCLOSING_MARK)
    x = x.toLowerCase
    x = IvToken.replaceAllIn(x, "intravenous")
    x = NonWord.replaceAllIn(x, " ")
    x = x.replace("microgram", "mcg").replace("μg", "mcg").replace("µg", "mcg")
    x = CcToken.replaceAllIn(x, "ml")
    x = x.replace("milli litre", "ml").replace("milliliter", "ml")
    x = normalizeUnitTokens(x)
    x = x.replace("milligram", "mg")
    x = x.replace("polymixin", "polymyxin")
    x = x.replace("hydrochlorde", "hydrochloride")
    Ws.replaceAllIn(x, " ").trim
  }

  /** Lowercase + alphanumeric-only + collapsed whitespace
    * (`text_utils.py:40-45`; labs variant `match_labs.py:18-26`).
    */
  def normalizeBasic(s: String): String = {
    if (s == null) return ""
    val lowered = s.toLowerCase.trim
    Ws.replaceAllIn("[^a-z0-9]+".r.replaceAllIn(lowered, " "), " ").trim
  }

  /** Strip trailing qualifiers, keeping only the base molecule name
    * (`text_utils.py:47-51`).
    */
  def baseName(s: String): String = {
    if (s == null) return ""
    val first = "(,| incl\\.| including )".r.split(s.toLowerCase.trim) match {
      case arr if arr.nonEmpty => arr(0)
      case _ => ""
    }
    Ws.replaceAllIn(first, " ").trim
  }

  /** Compact form: normalized text with spaces/hyphens removed
    * (`text_utils.py:117-119`).
    */
  def normalizeCompact(s: String): String =
    "[ \\-]".r.replaceAllIn(normalizeText(s), "")

  /** Lowercase slug for identifiers (`text_utils.py:121-124`). */
  def slugId(s: String): String = {
    val base = normalizeText(if (s == null) "" else s)
    "[^a-z0-9]+".r.replaceAllIn(base, "_").stripPrefix("_").stripSuffix("_")
  }

  /** ATC code cleanup: strip whitespace incl. non-breaking spaces
    * (`text_utils.py:126-130`).
    */
  def cleanAtc(s: String): String =
    if (s == null) "" else s.replace(" ", " ").trim

  /** Tolerant float parse; comma decimal separators accepted
    * (`text_utils.py:132-141`).
    */
  def safeToFloat(s: String): Option[Double] = {
    if (s == null) return None
    try Some(s.replace(",", ".").trim.toDouble)
    catch { case _: NumberFormatException => None }
  }
}
