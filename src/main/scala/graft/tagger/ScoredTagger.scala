package graft.tagger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DetailsLib, SaltLib, TextNorm, TokenLib}

/** The composed C1 tagging flow (`tagger.py:560-1030`, Parts 2/3): probe
  * generation -> waterfall candidate gathering (ALL hits, not top-1) ->
  * per-text input-shape classification -> rule-based candidate selection
  * via [[Scoring.selectBestCandidate]] -> result with match_reason in
  * {matched, no_candidates, no_match}.
  *
  * Execution shape: candidate gathering is broadcast joins; selection is
  * row-local per text (candidate sets are 5–20 rows, `docs/
  * pipeline_drugs.md:44-51`), expressed as a typed mapGroups over the
  * grouped candidates — one shuffle on text id.
  *
  * Round-1 scope note: the reference's fuzzy-correction feedback into the
  * normalized-generic set (`tagger.py:880-896`) is not yet wired.
  */
object ScoredTagger {

  final case class CandRow(id: Long, text: String, leg: Int, probe_pos: Int,
      key: String, generic_name: String, atc_code: String, drugbank_id: String,
      form: String, route: String, source: String, reference_text: String)

  final case class TagResult(id: Long, generic_name: String, atc_code: String,
      drugbank_id: String, reference_text: String, match_reason: String)

  /** Input-shape classification (`tagger.py:915-920`) + scoring inputs. */
  private[tagger] final case class InputShape(
      inputForms: Set[String], genericsNormalized: Set[String],
      isSingle: Boolean, isCombination: Boolean, isIv: Boolean,
      strippedGenerics: List[String], details: Map[String, String])

  private[tagger] def classify(text: String): InputShape = {
    // keep stopwords: form/route words are members of the stopword set and
    // must reach categorize_tokens to land in their categories
    val tokens = TokenLib.normalizeTokens(
      TextNorm.normalizeText(text).split(" ").toSeq,
      dropStopwords = false, originalText = text)
    val cats = TokenLib.categorizeTokens(tokens)
    // '+'-combination splitting (extract_generic_tokens, tokenizer.py):
    // "IBUPROFEN+PARACETAMOL" contributes both components
    val genericToks = tokens.filter(cats("generic").contains)
      .flatMap(t => if (t.contains("+"))
        t.split("\\s*\\+\\s*").toList.map(_.trim).filter(_.nonEmpty)
      else List(t))
    // "X IN Y" IV solutions: the vehicle on the right of IN is a generic
    // too (DEXTROSE IN SODIUM CHLORIDE -> both components; the tokenizer's
    // trailing-salt guard otherwise splits the vehicle into salt tokens)
    val upNorm = TextNorm.normalizeText(text).toUpperCase
    val inIdx = upNorm.indexOf(" IN ")
    val vehicle =
      if (inIdx >= 0) {
        val right = upNorm.substring(inIdx + 4)
        graft.functions.Constants.pureSaltCompounds.toList.sorted
          .find(right.contains).toList
      } else Nil
    val stripped = (genericToks ++ vehicle).map(t => SaltLib.stripSaltSuffix(t)._1)
    var normalized = stripped.map(s => SaltLib.applySynonym(s))
      .filterNot(Set("+", "MG/5")).toSet
    val comboKeys = TokenLib.buildCombinationKeys(tokens)
    for (ck <- comboKeys) {
      val ckSyn = SaltLib.applySynonym(ck)
      if (ckSyn != ck && ckSyn != "+" && ckSyn != "MG/5") normalized += ckSyn
    }
    val up = text.toUpperCase
    val hasPlus = text.contains("+")
    val hasIn = up.contains(" IN ") && normalized.size > 1
    val d = DetailsLib.extractDrugDetails(text)
    val details = Seq(
      "type_details" -> d.typeDetails, "release_details" -> d.releaseDetails,
      "form_details" -> d.formDetails, "indication_details" -> d.indicationDetails,
      "salt_details" -> d.saltDetails, "alias_details" -> d.aliasDetails,
      "iv_diluent_type" -> d.ivDiluentType)
      .collect { case (k, Some(v)) => k -> v }.toMap
    InputShape(
      inputForms = cats("form").keySet,
      genericsNormalized = normalized,
      isSingle = normalized.size == 1,
      isCombination = normalized.size > 1 && hasPlus,
      isIv = hasIn && !hasPlus,
      strippedGenerics = stripped,
      details = details)
  }

  /** @param texts   (id: Long, text: String)
    * @param catalog (key, generic_name, atc_code, drugbank_id, form,
    *                route, source, reference_text)
    */
  def tagTexts(spark: SparkSession, texts: DataFrame, catalog: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.Config()): DataFrame = {
    import spark.implicits._

    // spread the regex-heavy probe/classify work across cores even when
    // the input is one file (same pattern as Dedup.shingleIndex). Shape
    // classification happens once per id inside the grouped selection —
    // computing it as a column instead gets re-evaluated per joined
    // candidate row by Catalyst (measured 3x slower, even pinned
    // nondeterministic, because unused nondeterministic columns also
    // defeat pruning on the probe branch).
    val spread = texts.repartition(col("id"))
    val probes = DrugTagger.probeFrame(spread, cfg)
    val hits = LookupWaterfall.allMatches(probes, catalog, cfg)
      .join(spread, Seq("id"))
      .select(col("id"), col("text"), col("leg"), col("probe_pos"),
        col("key"), col("generic_name"), col("atc_code"), col("drugbank_id"),
        col("form"), col("route"), col("source"), col("reference_text"))
      .as[CandRow]

    val selected = hits.groupByKey(_.id).mapGroups { (id, it) =>
      val rows0 = it.toList.sortBy(r => (r.leg, r.probe_pos, r.key))
      // G2 ATC explode (`tagger.py:839-856`): a candidate carrying several
      // pipe-joined ATC codes becomes one candidate per code, in
      // preference order (singles before combinations, D4)
      val rows = rows0.flatMap { r =>
        if (r.atc_code != null && r.atc_code.contains("|"))
          Scoring.sortAtcCodes(r.atc_code.split("\\|").toSeq)
            .map(a => r.copy(atc_code = a))
        else List(r)
      }
      val shape = classify(rows.head.text)
      val cands = rows.map(r => Scoring.Candidate(r.generic_name, r.atc_code,
        r.form, r.route, r.source, r.reference_text))
      Scoring.selectBestCandidate(
        cands, shape.inputForms, shape.genericsNormalized,
        shape.isSingle, shape.isCombination, shape.isIv,
        shape.strippedGenerics, shape.details) match {
        case Some(best) =>
          val idx = cands.indexWhere(_ eq best)
          val row = rows(idx)
          TagResult(id, row.generic_name, row.atc_code, row.drugbank_id,
            row.reference_text, "matched")
        case None =>
          TagResult(id, null, null, null, null, "no_match")
      }
    }.toDF()

    texts.join(selected, Seq("id"), "left")
      .withColumn("match_reason",
        coalesce(col("match_reason"), lit("no_candidates")))
  }
}
