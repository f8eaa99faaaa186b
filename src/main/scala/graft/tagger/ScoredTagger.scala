package graft.tagger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DetailsLib, SaltLib, TextNorm, TokenLib}

/** The composed C1 tagging flow (`tagger.py:560-1030`, Parts 2/3): probe
  * generation -> waterfall candidate gathering (ALL hits, not top-1) ->
  * per-text input-shape classification -> rule-based candidate selection
  * -> result with match_reason in {matched, no_candidates, no_match}.
  *
  * Execution shape (100 TB design):
  *   - distinct texts are tagged ONCE and re-joined by text (D1, the
  *     reference's `drop_duplicates` optimization `tagger.py:436-441`,
  *     `runners.py:192-230`) — duplication factor never multiplies the
  *     probe/classify UDF cost;
  *   - the candidate path carries only `id` + catalog payload, never the
  *     raw text: shape classification runs once per unique text into a
  *     compact keyed frame joined back on id (same hash partitioning the
  *     selection window needs, so the join output feeds the window with
  *     no extra exchange);
  *   - selection is rank columns (one struct-valued UDF eval per
  *     candidate row — [[Scoring.candidateRank]]) + a `row_number`
  *     window over a TOTAL order (SURVEY §2.10 D3 preferred form):
  *     whole-stage codegen spans the join/window path instead of the
  *     round-1 `mapGroups` object path, and the selection is
  *     oracle-expressible (q26).
  *
  * Round-2 scope note: the reference's fuzzy-correction feedback into the
  * normalized-generic set (`tagger.py:880-896`) is not yet wired.
  */
object ScoredTagger {

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

  /** Column-shaped input classification: one row per unique text id.
    * Sequences are sorted where the source is a Set so the frame is
    * deterministic; `genericsMatch` re-sorts internally anyway. The three
    * booleans pack into a bitmask (1=single, 2=combination, 4=iv) to stay
    * under the UDF arity limit downstream.
    */
  final case class ShapeRow(input_forms: Seq[String],
      generics_norm: Seq[String], shape_flags: Int,
      stripped: Seq[String], details: Map[String, String])

  private[tagger] def shapeRowOf(text: String): ShapeRow = {
    val s = classify(text)
    ShapeRow(
      s.inputForms.toSeq.sorted,
      s.genericsNormalized.toSeq.sorted,
      (if (s.isSingle) 1 else 0) | (if (s.isCombination) 2 else 0) |
        (if (s.isIv) 4 else 0),
      s.strippedGenerics,
      s.details)
  }

  // asNondeterministic is an OPTIMIZER BARRIER here, not a semantic
  // marker: extracting N fields from a struct-valued UDF in a collapsed
  // Project re-evaluates the UDF N times (the round-1 lambda-inlining
  // trap, Dedup.scala:27-36). Nondeterministic expressions are never
  // duplicated by CollapseProject, so the struct materializes once and
  // field reads are GetStructField over the attribute.
  private val shapeUdf = udf((text: String) => shapeRowOf(text))
    .asNondeterministic()

  /** [[Scoring.candidateRank]] as a row-level expression: null when the
    * candidate is filtered (invalid), else a (mp, ap, fp, ds) struct.
    * route/source never enter the rank (`scoring.py:203-387`), so they
    * are not passed.
    */
  private val rankUdf = udf((genericName: String, atcCode: String,
      form: String, refText: String, inputForms: Seq[String],
      genericsNorm: Seq[String], flags: Int, stripped: Seq[String],
      details: Map[String, String]) =>
    Scoring.candidateRank(
      Scoring.Candidate(genericName, if (atcCode == null) "" else atcCode,
        if (form == null) "" else form, "", "",
        if (refText == null) "" else refText),
      inputForms.toSet, genericsNorm.toSet,
      (flags & 1) != 0, (flags & 2) != 0, (flags & 4) != 0,
      stripped.toList, details)).asNondeterministic() // same barrier as shapeUdf

  /** G2 ATC explode (`tagger.py:839-856`): a pipe-joined ATC payload
    * becomes one candidate per code in preference order (singles before
    * combinations, D4 `sort_atc_codes`).
    */
  private val sortedAtcUdf = udf((atc: String) =>
    if (atc != null && atc.contains("|"))
      Scoring.sortAtcCodes(atc.split("\\|").toSeq)
    else Seq(atc))

  /** Candidate gathering + windowed selection over explicit probe and
    * shape frames — the engine core of C1, also driven directly by the
    * q26 oracle demo with SQL-defined probes/shapes.
    *
    * @param probes  (id, probe_pos, probe)
    * @param catalog (key, generic_name, atc_code, drugbank_id, form,
    *                route, source, reference_text) — broadcastable
    * @param shapes  (id, input_forms, generics_norm, shape_flags,
    *                stripped, details) — one row per id
    * @return one row per id that had ANY candidate: id, generic_name,
    *         atc_code, drugbank_id, reference_text, match_reason in
    *         {matched, no_match}; ids with zero candidates are absent
    *         (callers left-join and coalesce no_candidates)
    */
  def tagCandidates(probes: DataFrame, catalog: DataFrame,
      shapes: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.Config()): DataFrame = {
    val hits = LookupWaterfall.allMatches(probes, catalog, cfg)
    // pinned-count spread: the rank-UDF stage below is CPU-bound on a
    // byte-small frame — AQE would coalesce its exchange to ~1 partition
    // (see graft.core.CpuSpread). The pin also fixes the join and window
    // partitioning so neither adds an exchange.
    val exploded = graft.core.CpuSpread.byKey(hits, col("id")).select(
      col("id"), col("leg"), col("probe_pos"), col("key"),
      col("generic_name"), col("drugbank_id"), col("form"), col("route"),
      col("source"), col("reference_text"),
      posexplode(sortedAtcUdf(col("atc_code"))).as(Seq("atc_idx", "atc_code")))

    // Join the compact per-id shape (no raw text) onto candidate rows:
    // both sides hash-partition on id, which is exactly the partitioning
    // the selection window needs — one exchange, reused.
    val ranked = exploded.join(shapes, Seq("id"))
      .withColumn("rank", rankUdf(
        col("generic_name"), col("atc_code"), col("form"),
        col("reference_text"), col("input_forms"), col("generics_norm"),
        col("shape_flags"), col("stripped"), col("details")))
      .filter(col("rank").isNotNull)

    // Reference rank tuple first (match type, ATC preference, form
    // equivalence, details score, -len(generic), atc), then a full-tuple
    // tie-break imposing a TOTAL order — the reference's stable sort keeps
    // shuffle-dependent input order on ties; we pin it so selected
    // drugbank_id/reference_text are bit-for-bit deterministic.
    val w = Window.partitionBy(col("id")).orderBy(
      col("rank.mp"), col("rank.ap"), col("rank.fp"), col("rank.ds"),
      length(col("generic_name")).desc, col("atc_code"),
      col("leg"), col("probe_pos"), col("key"), col("atc_idx"),
      col("generic_name"), col("source"), col("form"), col("route"),
      col("reference_text"), col("drugbank_id"))
    val best = ranked.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("generic_name"), col("atc_code"),
        col("drugbank_id"), col("reference_text"))

    hits.select("id").distinct()
      .join(best, Seq("id"), "left")
      .withColumn("match_reason",
        when(col("generic_name").isNotNull, lit("matched"))
          .otherwise(lit("no_match")))
  }

  /** @param texts   (id: Long, text: String)
    * @param catalog (key, generic_name, atc_code, drugbank_id, form,
    *                route, source, reference_text)
    */
  def tagTexts(spark: SparkSession, texts: DataFrame, catalog: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.Config()): DataFrame = {
    // D1 dedup-before-tag: the regex-heavy probe/classify UDFs and the
    // whole candidate/selection path run once per DISTINCT text; results
    // re-join by text (min(id) keeps the representative deterministic).
    // The pinned-count spread keeps the probe/classify UDF stages at full
    // parallelism — the groupBy's own exchange is AQE-coalescible down to
    // single partitions on byte-small text frames (core.CpuSpread).
    val uniq = graft.core.CpuSpread.byKey(
      texts.groupBy("text").agg(min(col("id")).as("id")), col("id"))
    val probes = DrugTagger.probeFrame(uniq, cfg)
    // Shape classification once per unique text, as a compact keyed frame
    // — computing it as a column on the candidate path instead gets
    // re-evaluated per joined candidate row by Catalyst (measured 3x
    // slower in round 1).
    val shapes = uniq
      .select(col("id"), shapeUdf(col("text")).as("shape"))
      .select(col("id"), col("shape.*"))
    val selected = tagCandidates(probes, catalog, shapes, cfg)

    texts
      .join(uniq.join(selected, Seq("id"), "left").drop("id"),
        Seq("text"), "left")
      .withColumn("match_reason",
        coalesce(col("match_reason"), lit("no_candidates")))
      .select(col("id"), col("text"), col("generic_name"), col("atc_code"),
        col("drugbank_id"), col("reference_text"), col("match_reason"))
  }
}
