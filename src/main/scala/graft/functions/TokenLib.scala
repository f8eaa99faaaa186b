package graft.functions

/** Tokenizer core (SURVEY §2.8 F14 subset): multiword-generic extraction
  * with salt-pattern and trailing-salt guards, then punctuation-stripping
  * tokenization with stopword drop (`tokenizer.py:955-1035`,
  * `normalize_tokens`).
  *
  * Greedy longest-first extraction is the reference's D7 optimization —
  * the multiword dictionary is sorted once (here at class init, in the
  * reference per call). Length ties break alphabetically for cross-run
  * determinism (the reference inherits Python set order, which is not
  * stable run-to-run).
  */
object TokenLib {

  /** `trailing_salt_words` (`tokenizer.py:984-988`): DRUG + <this> is a
    * salt tail, not a generic, unless preceded by a cation word.
    */
  val trailingSaltWords: Set[String] = Set(
    "SODIUM PHOSPHATE", "DISODIUM PHOSPHATE", "SODIUM SUCCINATE",
    "SODIUM SULFATE", "POTASSIUM PHOSPHATE", "CALCIUM PHOSPHATE",
    "MAGNESIUM SULFATE", "SODIUM CHLORIDE")

  private val cationPrefixes = Set(
    "SODIUM", "DISODIUM", "POTASSIUM", "CALCIUM", "MAGNESIUM")

  private val SaltParenRx = "(?i)\\(\\s*as\\s+([^)]+)\\)".r
  private val StripChars = ".,;:!?\"'()[]{}".toSet

  private lazy val multiwordSorted: List[String] =
    Constants.multiwordGenerics.toList.sortBy(m => (-m.length, m))

  private def isTrailingSalt(mwg: String, origText: String): Boolean = {
    if (origText.isEmpty || !trailingSaltWords.contains(mwg)) return false
    val origUpper = origText.toUpperCase
    val pos = origUpper.indexOf(mwg)
    if (pos < 0) return false
    val before = origUpper.substring(0, pos).trim
    if (before.nonEmpty) {
      val lastWord = before.split("\\s+").last
      !cationPrefixes.contains(lastWord)
    } else false
  }

  private def stripEnds(tok: String): String =
    tok.dropWhile(StripChars.contains).reverse
      .dropWhile(StripChars.contains).reverse

  /** `normalize_tokens` (`tokenizer.py:955-1035`): uppercase, extract
    * multiword generics longest-first (excluding "( as ...)" salt-pattern
    * content and trailing-salt tails), then split the remainder, strip
    * edge punctuation, drop stopwords.
    */
  def normalizeTokens(tokens: Seq[String], dropStopwords: Boolean = true,
      multiwordGenerics: List[String] = multiwordSorted,
      originalText: String = ""): List[String] = {
    val result = List.newBuilder[String]
    var text = tokens.mkString(" ").toUpperCase

    val saltPatternContent: Set[String] =
      SaltParenRx.findAllMatchIn(originalText)
        .map(_.group(1).trim.toUpperCase).toSet

    for (mwg <- multiwordGenerics) {
      if (text.contains(mwg)) {
        val inSaltPattern =
          saltPatternContent.exists(sc => sc.contains(mwg) || mwg.contains(sc))
        if (!inSaltPattern && !isTrailingSalt(mwg, originalText)) {
          result += mwg
          text = text.replace(mwg, " ")
        }
      }
    }

    for (raw <- text.split("[\\s,;]+") if raw.nonEmpty) {
      val tok = stripEnds(raw).toUpperCase
      if (tok.nonEmpty && !(dropStopwords && Constants.stopwords.contains(tok)))
        result += tok
    }
    result.result()
  }

  /** F14 `detect_compound_salts` (`tokenizer.py:929-955`): pair adjacent
    * tokens that form a known pure-salt compound into one token
    * ("SODIUM" "CHLORIDE" -> "SODIUM CHLORIDE"), greedy left-to-right,
    * each token used at most once.
    */
  def detectCompoundSalts(tokens: Seq[String]): List[String] = {
    val result = List.newBuilder[String]
    var i = 0
    val ts = tokens.toIndexedSeq
    while (i < ts.length) {
      val up = ts(i).toUpperCase
      if (i + 1 < ts.length &&
        Constants.pureSaltCompounds.contains(s"$up ${ts(i + 1).toUpperCase}")) {
        result += s"$up ${ts(i + 1).toUpperCase}"
        i += 2
      } else {
        result += ts(i)
        i += 1
      }
    }
    result.result()
  }

  /** Convenience: tokenize a free-text description directly (raw split ->
    * compound-salt pairing -> normalize, the `extract_generic_tokens`
    * tokenization path `tokenizer.py:1193-1195`).
    */
  def tokenizeText(text: String, dropStopwords: Boolean = true): List[String] =
    if (text == null) Nil
    else normalizeTokens(detectCompoundSalts(text.split("\\s+").toSeq),
      dropStopwords, originalText = text)

  private val DosePattern =
    "(?i)^(\\d+(?:\\.\\d+)?)\\s*(mg|g|mcg|ug|ml|l|iu|unit|units|pct|%|mg/ml|mcg/ml|iu/ml|mg/5ml)".r

  /** A7/F14 `categorize_tokens` (`tokenizer.py:1037-1110`): per-text token
    * frequency maps per category (generic/salt/dose/form/route/other).
    * Row-local — no shuffle; the only "aggregate" that lives inside a
    * row-wise function (SURVEY §2.4).
    */
  def categorizeTokens(tokens: Seq[String]): Map[String, Map[String, Int]] = {
    // LinkedHashMaps: the reference's dicts preserve insertion order, and
    // the tagger output emits category keys in first-seen token order
    // (`tagger.py:936-938`)
    import scala.collection.mutable.LinkedHashMap
    val cats = LinkedHashMap(
      "generic" -> LinkedHashMap.empty[String, Int],
      "salt" -> LinkedHashMap.empty[String, Int],
      "dose" -> LinkedHashMap.empty[String, Int],
      "form" -> LinkedHashMap.empty[String, Int],
      "route" -> LinkedHashMap.empty[String, Int],
      "other" -> LinkedHashMap.empty[String, Int])
    def add(cat: String, tok: String): Unit =
      cats(cat)(tok) = cats(cat).getOrElse(tok, 0) + 1
    for (tok <- tokens) {
      val up = tok.toUpperCase
      if (DosePattern.findPrefixMatchOf(up).isDefined ||
        Constants.unitTokens.contains(up)) add("dose", up)
      else if (Constants.formCanon.contains(up))
        add("form", Constants.formCanon(up))
      else if (Constants.routeCanon.contains(up))
        add("route", Constants.routeCanon(up))
      else if (Constants.saltTokens.contains(up)) {
        // element drugs count as the generic ONLY as the first token
        if (Constants.elementDrugs.contains(up) && tokens.indexOf(tok) == 0)
          add("generic", up)
        else add("salt", up)
      } else if (up.replace(".", "").nonEmpty &&
        up.replace(".", "").forall(_.isDigit)) add("dose", up)
      else if (Constants.stopwords.contains(up)) add("other", up)
      else if (up.trim.isEmpty || up.trim.length < 2 ||
        !up.exists(_.isLetter) || up.contains("*") ||
        Set("GENERIC", "OP", "GRAM", "100S").contains(up)) add("other", up)
      else add("generic", up)
    }
    cats.iterator.map { case (k, v) =>
      k -> v.to(scala.collection.immutable.SeqMap): (String, Map[String, Int])
    }.to(scala.collection.immutable.SeqMap)
  }

  private val comboJunk = Set("+", "MG/5", "MG", "G", "MCG", "ML", "L", "PCT")
  private val comboSaltSuffixes = List(
    "HYDROXIDE", "CHLORIDE", "SULFATE", "SULPHATE", "CARBONATE",
    "PHOSPHATE", "ACETATE", "CITRATE")

  /** Unique, salt-stripped combination components in original order —
    * shared by the key-variant builder below and the mixture
    * component-key (J11: sorted '|'-joined key,
    * `build_unified_reference.py:486-500`, probed `tagger.py:309-360`).
    */
  def combinationComponents(genericTokens: Seq[String]): List[String] = {
    val clean = genericTokens.toList.flatMap { g0 =>
      if (g0 == null || g0.isEmpty) Nil
      else {
        val gU = g0.toUpperCase
        if (comboJunk.contains(gU) || g0.exists(_.isDigit) ||
          g0.contains("(") || g0.contains(")")) Nil
        else {
          val gc = gU.reverse.dropWhile(_ == '+').reverse.trim
          if (gc.isEmpty) Nil
          else if (gc.contains("+"))
            gc.split("\\s*\\+\\s*").toList.map(_.trim)
              .filter(p => p.nonEmpty && !comboJunk.contains(p))
          else List(gc)
        }
      }
    }
    if (clean.size < 2) return Nil
    val baseParts = clean.flatMap { part =>
      var stripped = SaltLib.stripSaltSuffix(part)._1
      comboSaltSuffixes.find(s => stripped.endsWith(" " + s)).foreach { s =>
        stripped = stripped.dropRight(s.length + 1).trim
      }
      if (stripped.nonEmpty) Some(stripped) else None
    }
    if (baseParts.size < 2) return Nil
    baseParts.distinct
  }

  /** G5 `build_combination_keys` (`lookup.py:309-402`): generic tokens ->
    * the combination lookup key variants ("A + B" sorted/original/
    * reversed, "A AND B" WHO style, "A, B AND C" for 3+, space-joined).
    * The reference returns a Python-set order; here the order is
    * deterministic (probe-set semantics, order never ranked).
    */
  def buildCombinationKeys(genericTokens: Seq[String]): List[String] = {
    val unique = combinationComponents(genericTokens)
    if (unique.size < 2) return Nil
    val sortedParts = unique.sorted
    val keys = scala.collection.mutable.LinkedHashSet[String]()
    keys += sortedParts.mkString(" + ")
    keys += unique.mkString(" + ")
    keys += unique.reverse.mkString(" + ")
    keys += sortedParts.mkString(" AND ")
    keys += sortedParts.reverse.mkString(" AND ")
    if (sortedParts.size > 2)
      keys += sortedParts.init.mkString(", ") + " AND " + sortedParts.last
    keys += unique.mkString(" ")
    keys += unique.reverse.mkString(" ")
    keys.toList
  }
}
