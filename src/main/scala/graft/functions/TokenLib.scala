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

  // the multiword dictionary is consumed through [[MwIndex]]: one
  // Aho-Corasick pass finds the present patterns instead of scanning all
  // 10^4-10^5 entries with a substring check per text (the reference's
  // O(M*|text|) loop, `tokenizer.py:1005/1172`)

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
      mw: MwIndex = MwIndex.default,
      originalText: String = ""): List[String] = {
    val text0 = tokens.mkString(" ").toUpperCase
    normalizeLoop(text0, mw.candidatesIn(text0), checkCreated = true, mw,
      dropStopwords, originalText)
  }

  /** The reference's extraction loop over a candidate iteration order.
    * The fast path iterates only the patterns PRESENT in the initial
    * text; replacing a match with " " can (pathologically) bridge
    * characters into a NEW occurrence the initial text didn't contain —
    * the reference's full-list scan would catch it at that pattern's own
    * sort position, so when the final text contains a pattern outside the
    * candidate set the loop redoes itself naively over the full
    * dictionary, reproducing the reference exactly.
    */
  private def normalizeLoop(text0: String, candidates: Seq[String],
      checkCreated: Boolean, mw: MwIndex, dropStopwords: Boolean,
      originalText: String): List[String] = {
    val result = List.newBuilder[String]
    var text = text0

    val saltPatternContent: Set[String] =
      SaltParenRx.findAllMatchIn(originalText)
        .map(_.group(1).trim.toUpperCase).toSet

    val candSet: Set[String] =
      if (checkCreated) candidates.toSet else Set.empty
    for (mwg <- candidates) {
      if (text.contains(mwg)) {
        val inSaltPattern =
          saltPatternContent.exists(sc => sc.contains(mwg) || mwg.contains(sc))
        if (!inSaltPattern && !isTrailingSalt(mwg, originalText)) {
          result += mwg
          text = text.replace(mwg, " ")
          // check after EVERY replacement: an occurrence created here can
          // be destroyed by a later replacement, so a final-text-only
          // check would miss it
          if (checkCreated &&
            mw.candidatesIn(text).exists(p => !candSet.contains(p)))
            return normalizeLoop(text0, mw.sorted.toSeq,
              checkCreated = false, mw, dropStopwords, originalText)
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

  private val ParensRx = "\\([^)]*\\)".r
  private val SaltParenContentRx = "(?i)\\(\\s*as\\s+([^)]+)\\)".r

  /** `split_with_parentheses` (`tokenizer.py:897-926`): whitespace/comma/
    * semicolon split that keeps parenthetical content as single tokens.
    */
  def splitWithParentheses(text: String): List[String] = {
    if (text == null || text.isEmpty) return Nil
    val norm = text.split("\\s+").filter(_.nonEmpty).mkString(" ")
    val parens = ParensRx.findAllIn(norm).toList
    val temp = ParensRx.replaceAllIn(norm, " __PAREN__ ")
    var pi = 0
    val out = List.newBuilder[String]
    for (tok <- temp.split("[\\s,;]+") if tok.nonEmpty) {
      if (tok == "__PAREN__" && pi < parens.length) {
        out += parens(pi); pi += 1
      } else if (tok != "__PAREN__") out += tok
    }
    out.result()
  }

  /** F14 `extract_generic_tokens` (`tokenizer.py:1113-1392`), the C1
    * front door, ported 1:1 in rule order: multiword extraction with
    * salt-pattern/trailing-salt guards and positional insertion, pure-
    * salt-compound additions, the `+`-combination part walk (packaging
    * skips, form-word drops, dose break, known-multiword short-circuit,
    * standalone-salt retention), the `" IN "` IV active/base reorder, and
    * the trailing form-modifier filter. Returns (tokens, generic_tokens).
    *
    * Determinism notes vs the reference: pure-salt iteration is sorted
    * (Python set order is arbitrary) and multiword length-ties sort
    * alphabetically — both only affect orders the reference itself does
    * not pin.
    */
  def extractGenericTokens(text: String,
      mw: MwIndex = MwIndex.default): (List[String], List[String]) = {
    if (text == null) return (Nil, Nil)
    val textUpper = text.toUpperCase

    val saltRanges = SaltParenContentRx.findAllMatchIn(textUpper)
      .map(m => (m.start, m.end)).toList
    def insideSaltPattern(pos: Int, len: Int): Boolean =
      saltRanges.exists { case (s, e) => pos >= s && pos + len <= e }
    def isTrailingSaltSuffix(mw: String): Boolean = {
      if (!trailingSaltWords.contains(mw)) return false
      val pos = textUpper.indexOf(mw)
      if (pos < 0) return false
      val before = textUpper.substring(0, pos).trim
      if (before.nonEmpty) {
        if (before.contains(" IN ")) return false
        !cationPrefixes.contains(before.split("\\s+").last)
      } else false
    }

    // multiword matches with positions (longest-first, substring-of-
    // matched suppression), then sorted by position; the candidate pass
    // is one automaton traversal of the UN-mutated text, so it is exactly
    // the reference's `contains` filter
    var matchedMw = List.empty[(Int, String)]
    for (m <- mw.candidatesIn(textUpper)) {
      val pos = textUpper.indexOf(m)
      if (!insideSaltPattern(pos, m.length) && !isTrailingSaltSuffix(m) &&
        !matchedMw.exists { case (_, ex) => ex.contains(m) })
        matchedMw ::= (pos, m)
    }
    val mwByPos = matchedMw.sortBy(_._1)

    val rawTokens = detectCompoundSalts(splitWithParentheses(text))
    val tokens = normalizeTokens(rawTokens, dropStopwords = true,
      mw, originalText = text)
    val cats = categorizeTokens(tokens)
    var generics = cats("generic").keys.toList

    // positional insertion of matched multiwords the tokenizer split
    for ((pos, mw) <- mwByPos if !generics.contains(mw)) {
      val at = generics.indexWhere(gt => textUpper.indexOf(gt) > pos)
      if (at >= 0) generics = generics.patch(at, List(mw), 0)
      else generics = generics :+ mw
    }

    // pure salt compounds present in text (skip "( as )" content and
    // trailing-salt suffixes); sorted iteration for determinism
    val saltContent = SaltParenContentRx.findAllMatchIn(textUpper)
      .map(_.group(1).trim).toSet
    for (psc <- Constants.pureSaltCompounds.toList.sorted
        if textUpper.contains(psc) && !generics.contains(psc)
          && !saltContent.exists(_.contains(psc))
          && !isTrailingSaltSuffix(psc))
      generics = generics :+ psc

    // '+' combination parts
    if (textUpper.contains("+")) {
      val skipComboWords = Set("DILUENT", "SOLVENT", "DOSE", "DOSES",
        "VIAL", "AMPULE", "SYRINGE")
      val formWords = Set("TABLET", "CAPSULE", "SOLUTION", "INJECTION",
        "SYRUP", "OINTMENT", "CREAM")
      var addedParts = List.empty[String]
      for (part0 <- textUpper.split("\\+", -1)) {
        val part = part0.trim
        val partWords = part.split("\\s+").filter(_.nonEmpty)
        if (!(partWords.nonEmpty && skipComboWords.contains(partWords.head))) {
          var partClean = SaltParenContentRx.replaceAllIn(part, "")
          partClean = partClean.replaceAll("\\(\\s*\\)", "")
          val allWords = List.newBuilder[String]
          var break = false
          for (w <- partClean.split("\\s+") if !break) {
            if (w.nonEmpty && !w.exists(_.isDigit) &&
              !Constants.unitTokens.contains(w)) {
              if (!formWords.contains(w)) allWords += w
            } else break = true
          }
          val aw = allWords.result()
          val fullCombo = aw.mkString(" ")
          if (mw.containsPattern(fullCombo)) {
            if (fullCombo.nonEmpty && !generics.contains(fullCombo)) {
              generics = generics :+ fullCombo
              addedParts ::= fullCombo
            }
          } else {
            val words = aw.filter(w =>
              !(Constants.stopwords.contains(w) || Constants.saltTokens.contains(w)) ||
                aw.length == 1)
            if (words.nonEmpty) {
              val comboPart = words.mkString(" ")
              if (!generics.contains(comboPart)) {
                generics = generics :+ comboPart
                addedParts ::= comboPart
              }
            }
          }
        }
      }
      if (addedParts.length >= 2)
        generics = generics.filter(g => !g.contains("+") && !g.startsWith("+"))
    }

    // " IN " IV solutions: active ingredient first, base second
    if (textUpper.contains(" IN ") && !textUpper.contains("+")) {
      val parts = textUpper.split(" IN ", 2)
      if (parts.length == 2) {
        val skipWords = Set("SOLUTION", "BOTTLE", "BAG", "VIAL", "AMPULE",
          "L", "ML", "WATER")
        val activeWords = parts(0).trim.split("\\s+").filter(w =>
          w.nonEmpty && !w.exists(_.isDigit) &&
            !Constants.unitTokens.contains(w) && !skipWords.contains(w))
        val activeName = if (activeWords.nonEmpty) Some(activeWords.mkString(" ")) else None
        val baseWords = List.newBuilder[String]
        var started = false
        var stop = false
        for (w <- parts(1).trim.split("\\s+") if !stop) {
          if (!started && (w.exists(_.isDigit) || Constants.unitTokens.contains(w))) {
            // skip leading dose tokens
          } else {
            started = true
            if (w.nonEmpty && !skipWords.contains(w)) {
              if (w.exists(_.isDigit) || Constants.unitTokens.contains(w)) stop = true
              else baseWords += w
            } else stop = true
          }
        }
        val bw = baseWords.result()
        val baseName = if (bw.nonEmpty) Some(bw.mkString(" ")) else None
        if (activeName.nonEmpty || baseName.nonEmpty) {
          var rest = generics
          val newOrder = List.newBuilder[String]
          for (an <- activeName) { rest = rest.filterNot(_ == an); newOrder += an }
          for (bn <- baseName) { rest = rest.filterNot(_ == bn); newOrder += bn }
          generics = newOrder.result() ++ rest
        }
      }
    }

    // trailing form-modifier filter (GELATIN after CAPSULE, etc.)
    val filterFormWords = Set("CAPSULE", "CAPSULES", "TABLET", "TABLETS",
      "SOLUTION", "SOLUTIONS", "SUSPENSION", "CREAM", "OINTMENT", "GEL",
      "LOTION", "POWDER")
    val formPositions = filterFormWords.toList
      .map(textUpper.indexOf(_)).filter(_ >= 0)
    if (formPositions.nonEmpty) {
      val formPos = formPositions.min
      val filtered = generics.filter { g =>
        val gU = g.toUpperCase
        !(Constants.formModifierIgnore.contains(gU) &&
          textUpper.indexOf(gU) > formPos)
      }
      if (filtered.nonEmpty) generics = filtered
    }

    (tokens, generics)
  }

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
    * the key-variant builder's shared front half (`lookup.py:309-355`).
    * The mixture component-key PROBE is a different build
    * (`_lookup_mixture`, `tagger.py:327-360`: synonym-normalized stripped
    * generics) and lives in ScoredTagger.shapeRowOf.
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
