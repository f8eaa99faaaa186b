package graft.functions

import scala.collection.mutable.ListBuffer

/** F16: base-molecule / salt-descriptor separation for PNF molecule
  * strings (`text_utils.py:71-115` as-boundary detection, `:219-351`
  * extract_base_and_salts) — "AMLODIPINE AS BESILATE" -> ("AMLODIPINE",
  * ["BESILATE"]), with the full candidate/ignore/measurement filter set
  * and the trailing-salt trim.
  */
object SaltExtract {

  /** `_build_salt_token_words` (`text_utils.py:182-195`): every salt token
    * plus its normalized word parts plus salt/salts.
    */
  lazy val saltTokenWords: Set[String] = {
    val b = Set.newBuilder[String]
    for (t <- Constants.saltTokens if t.nonEmpty) {
      b += t.toLowerCase
      TextNorm.normalizeText(t).split(" ").filter(_.nonEmpty).foreach(b += _)
    }
    b += "salt"
    b += "salts"
    b.result()
  }

  private lazy val specialSaltTokens: Set[String] =
    Constants.saltCations.map(_.toLowerCase)
  private lazy val baseGenericIgnore: Set[String] =
    Constants.stopwords.map(_.toLowerCase) ++
      Constants.unitTokens.map(_.toLowerCase)
  private lazy val measurementTokens: Set[String] =
    Constants.unitTokens.map(_.toLowerCase)
  private lazy val saltTailBreak: Set[String] =
    Constants.saltTailBreakTokens.map(_.toLowerCase)

  private val CoreStrip = ".,;:'\"()[]{}".toSet

  /** `_token_core` (`text_utils.py:31-33`). */
  def tokenCore(tok: String): String =
    tok.toLowerCase.dropWhile(CoreStrip.contains)
      .reverse.dropWhile(CoreStrip.contains).reverse

  /** `_is_measurement_token` (`text_utils.py:199-205`). */
  def isMeasurementToken(tok0: String): Boolean = {
    val tok = tok0.toLowerCase
    measurementTokens.contains(tok) || Set("%", "ratio", "per").contains(tok) ||
      tok.endsWith("ml") || tok.endsWith("mg")
  }

  /** `_looks_like_salt_tail` (`text_utils.py:75-95`). */
  def looksLikeSaltTail(tokens: List[String], startIdx: Int): Boolean = {
    var seenSalt = false
    for (tok <- tokens.drop(startIdx)) {
      val tl = tok.toLowerCase
      if (saltTailBreak.contains(tl)) return seenSalt
      if (tok.nonEmpty) {
        if (tok.exists(_.isDigit) || tok == "%" || tok == "per") return seenSalt
        if (tl != "and/or") {
          if (saltTokenWords.contains(tl)) seenSalt = true
          else return false
        }
      }
    }
    seenSalt
  }

  /** `detect_as_boundary` (`text_utils.py:98-109`): index of the first
    * "as" token introducing salt descriptors.
    */
  def detectAsBoundary(normText: String): Option[Int] = {
    if (normText == null) return None
    val tokens = normText.split(" ").toList
    tokens.zipWithIndex.collectFirst {
      case ("as", idx) if looksLikeSaltTail(tokens, idx + 1) => idx
    }
  }

  /** `strip_after_as` (`text_utils.py:112-124`). */
  def stripAfterAs(normText: String): String = {
    if (normText == null) return ""
    detectAsBoundary(normText) match {
      case Some(boundary) if boundary > 0 =>
        val tokens = normText.split(" ")
        if (boundary >= tokens.length) normText
        else {
          val stripped = tokens.take(boundary).mkString(" ").trim
          if (stripped.nonEmpty) stripped else normText
        }
      case _ => normText
    }
  }

  private def shouldTreatAsSalt(tokLower: String, idx: Int,
      candidates: List[String]): Boolean = {
    if (!saltTokenWords.contains(tokLower)) return false
    if (tokLower == "salt" || tokLower == "salts") return false
    val prev = if (idx > 0) candidates(idx - 1).toLowerCase else ""
    if (prev == "as") return true
    if (specialSaltTokens.contains(tokLower)) return false
    true
  }

  private def isCandidate(tok: String): Boolean = {
    val tokLower = tok.toLowerCase
    val tokKey = tokenCore(tok)
    if (baseGenericIgnore.contains(tokKey)) return false
    if (isMeasurementToken(tokKey)) return false
    if (tokLower == "%") return false
    if (!tokLower.exists(c => c >= 'a' && c <= 'z')) return false
    if (tokLower.nonEmpty && tokLower.head.isDigit) return false
    if (tokLower.exists(_.isDigit) &&
      !tokLower.matches("[a-z]+[0-9]+[a-z0-9]*")) return false
    true
  }

  /** `extract_base_and_salts` (`text_utils.py:219-351`). */
  def extractBaseAndSalts(rawText: String): (String, List[String]) = {
    if (rawText == null) return ("", Nil)
    val norm = TextNorm.normalizeText(rawText)
    val tokens = norm.split(" ").filter(_.nonEmpty).toList
    val boundary = detectAsBoundary(norm)
    val baseCandidates = boundary match {
      case None => tokens
      case Some(b) => tokens.take(b)
    }
    val saltCandidates = boundary match {
      case None => Nil
      case Some(b) => tokens.drop(b + 1)
    }
    val saltTokens = ListBuffer.empty[String]
    val baseTokens = ListBuffer.empty[String]
    val pendingLeadingSalts = ListBuffer.empty[String]

    for (tok <- saltCandidates) {
      val tl = tok.toLowerCase
      if (!Set("and", "with", "plus", "+", "/").contains(tl) && tl.nonEmpty &&
        tl.exists(c => c >= 'a' && c <= 'z') && saltTokenWords.contains(tl) &&
        tl != "salt" && tl != "salts")
        saltTokens += tok.toUpperCase
    }

    def truncateTokens(toks: List[String]): List[String] = {
      val out = ListBuffer.empty[String]
      var break = false
      for ((tok, idx) <- toks.zipWithIndex if !break) {
        val tokLower = tok.toLowerCase
        val tokKey = tokenCore(tok)
        if (tok == "+" || tok == "/" || tok == "&") {
          if (out.nonEmpty) out += tok.toUpperCase
        } else if (tokLower == "as") break = true
        else if (shouldTreatAsSalt(tokLower, idx, toks)) ()
        else if (isMeasurementToken(tokKey)) ()
        else if (baseGenericIgnore.contains(tokKey) &&
          !saltTokenWords.contains(tokLower)) ()
        else if (!tokLower.exists(c => c >= 'a' && c <= 'z')) ()
        else if (tokLower.exists(_.isDigit)) {
          if (tokLower.matches("[a-z]+[0-9]+[a-z0-9]*")) out += tok.toUpperCase
        } else out += tok.toUpperCase
      }
      out.toList
    }

    for ((tok, idx) <- baseCandidates.zipWithIndex) {
      val tl = tok.toLowerCase
      if (tok == "+" || tok == "/" || tok == "&") {
        if (baseTokens.nonEmpty &&
          baseCandidates.drop(idx + 1).exists(isCandidate))
          baseTokens += tok
      } else if (shouldTreatAsSalt(tl, idx, baseCandidates)) {
        if (baseTokens.nonEmpty) saltTokens += tok.toUpperCase
        else pendingLeadingSalts += tok.toUpperCase
      } else if (isCandidate(tok)) {
        baseTokens += tok.toUpperCase
      }
    }

    if (baseTokens.isEmpty) baseTokens ++= truncateTokens(baseCandidates)
    if (baseTokens.isEmpty && pendingLeadingSalts.nonEmpty)
      baseTokens ++= pendingLeadingSalts

    // trailing-salt trim (pops from baseTokens in place, as the reference)
    if (baseTokens.nonEmpty &&
      baseTokens.exists(t => !saltTokenWords.contains(t.toLowerCase))) {
      val trimmed = ListBuffer.empty[String]
      while (baseTokens.nonEmpty &&
        saltTokenWords.contains(baseTokens.last.toLowerCase)) {
        val token = baseTokens.remove(baseTokens.length - 1)
        val tl = token.toLowerCase
        if (tl != "salt" && tl != "salts") trimmed += token.toUpperCase
      }
      saltTokens ++= trimmed.reverse
    }

    var base = baseTokens.mkString(" ").trim.toUpperCase
    var uniqueSalts = saltTokens.toList.distinct.filter(_.nonEmpty)
    if (base.isEmpty && uniqueSalts.nonEmpty) {
      base = uniqueSalts.mkString(" ")
      uniqueSalts = Nil
    }
    if (base.isEmpty && rawText.nonEmpty) base = rawText.trim.toUpperCase
    (base, uniqueSalts)
  }

  /** `serialize_salt_list` (`text_utils.py:208-218`). */
  def serializeSaltList(salts: Seq[String]): String = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    for (s <- salts; c = s.trim.toUpperCase if c.nonEmpty) seen += c
    seen.mkString(" + ")
  }
}
