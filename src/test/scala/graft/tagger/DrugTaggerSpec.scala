package graft.tagger

import graft.SparkSpec

/** Golden tests for the C1 tagging skeleton with drug-like fixtures
  * (inputs modeled on FIXTURES.md eSOA coverage cases).
  */
class DrugTaggerSpec extends SparkSpec {

  private lazy val catalog = {
    import spark.implicits._
    Seq(
      ("paracetamol", "N02BE01", "DB00316"),
      ("amoxicillin trihydrate", "J01CA04", "DB01060"),
      ("ibuprofen", "M01AE01", "DB01050"),
      ("cefalexin", "J01DB01", "DB00567"),
      ("ibuprofen + paracetamol", "M01AE51", "DBCOMBO"),
      ("rabies vaccine", "J07BG01", "DBRABV"),
      // mixture table row keyed by sorted component_key (J11)
      ("lamivudine|zidovudine", "J05AR01", "DBMIX1"))
      .toDF("key", "atc_code", "drugbank_id")
  }

  private def tag(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    DrugTagger.tagTexts(spark, rows.toDF("id", "text"), catalog)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("match_reason"), r.getAs[String]("atc_code"))).toMap
  }

  test("exact match: PARACETAMOL 500MG TAB -> N02BE01") {
    val out = tag(Seq((1L, "PARACETAMOL 500MG TAB")))
    assert(out(1L) == ("exact", "N02BE01"))
  }

  test("token-prefix match: AMOXICILLIN 500 MG CAP -> trihydrate entry") {
    val out = tag(Seq((1L, "AMOXICILLIN 500 MG CAP")))
    assert(out(1L) == ("prefix", "J01CA04"))
  }

  test("table synonyms drive the exact leg; the static tagger dict alone does not") {
    import spark.implicits._
    // CEPHALEXIN -> CEFALEXIN is NOT in the tagger's static dict
    // (spelling + REGIONAL_TO_US, tagger.py:209-213; the pair lives in
    // the Part-4 ALL_DRUG_SYNONYMS universe) — verified against a real
    // reference run: no_candidates without table synonyms. With a
    // unified_synonyms entry merged in, the exact leg fires.
    val texts = Seq((1L, "CEPHALEXIN 250MG/5ML SYRUP")).toDF("id", "text")
    val bare = DrugTagger.tagTexts(spark, texts, catalog)
      .collect().map(r => r.getAs[String]("match_reason")).head
    assert(bare == "no_match") // probes never produce the cefalexin key
    val probes = DrugTagger.probeFrame(texts,
      synonyms = Map("CEPHALEXIN" -> "CEFALEXIN"))
    val withSyn = LookupWaterfall.tag(probes, catalog)
      .collect().map(r => (r.getAs[Int]("leg"), r.getAs[String]("atc_code")))
    assert(withSyn.contains((1, "J01DB01")))
  }

  test("fuzzy match catches novel misspellings: CEFALEXIM -> CEFALEXIN") {
    val out = tag(Seq((1L, "CEFALEXIM 250MG/5ML SYRUP")))
    assert(out(1L) == ("fuzzy", "J01DB01"))
  }

  test("normalization feeds the probes: typo + units folded") {
    // gm must not corrupt the molecule, noise tokens are not probes
    val out = tag(Seq((1L, "IBUPROFEN 1 GM SUSPENSION 60 CC")))
    assert(out(1L) == ("exact", "M01AE01"))
  }

  test("no_match is attributed, not dropped") {
    val out = tag(Seq((1L, "SURGICAL GLOVES SIZE 7")))
    assert(out(1L)._1 == "no_match")
    assert(out(1L)._2 == null)
  }

  test("exact short-circuits the later legs (first-match-wins)") {
    // both an exact ('ibuprofen') and a fuzzy candidate in one text: the
    // exact leg must win regardless of token order
    val out = tag(Seq((1L, "IBUPROFENE + IBUPROFEN 200MG")))
    assert(out(1L) == ("exact", "M01AE01"))
  }

  test("combination keys resolve combo catalog entries") {
    // 'IBUPROFEN+PARACETAMOL' is not a single token probe, but the G5
    // combination keys include 'ibuprofen + paracetamol'
    val out = tag(Seq((1L, "IBUPROFEN+PARACETAMOL 200MG/325MG TABLET")))
    assert(out(1L)._2 == "M01AE51")
  }

  test("vaccine canonicalization feeds the probe set") {
    val out = tag(Seq((1L, "ANTI RABIES VACCINE 2.5 IU VIAL")))
    assert(out(1L) == ("exact", "J07BG01"))
  }

  test("blocked fuzzy mode matches scan mode exactly") {
    import spark.implicits._
    val cat = Seq("cefalexin", "cephalexin", "ceftriaxone", "cefuroxime",
      "paracetamol", "salbutamol", "amoxicillin")
      .map(k => (k, k.toUpperCase)).toDF("key", "generic_name")
    val probes = Seq((1L, 0, "cefalexim"), (2L, 0, "salbutamul"),
      (3L, 0, "paracetamol"), (4L, 0, "zzzzz"), (5L, 0, "amoxicilin"))
      .toDF("id", "probe_pos", "probe")
    def run(mode: String) = LookupWaterfall.allMatches(probes, cat,
        LookupWaterfall.Config(fuzzyMode = mode))
      .select("id", "probe", "key", "leg", "score")
      .collect().map(_.toSeq).toSet
    assert(run("blocked") == run("scan"))
    assert(run("scan").exists(r => r(0) == 1L && r(2) == "cefalexin"))
  }

  test("ratio mode ignores fuzzyMaxDist (fuzzy gate is ratio-only)") {
    import spark.implicits._
    // referenceConfig runs fuzzyMode="ratio" while Config still carries
    // the scan/blocked-mode fuzzyMaxDist knob; if a future edit wired
    // that knob into the ratio leg, reference fuzzy semantics
    // (rapidfuzz ratio >= 85, len >= 4) would silently change. Pin:
    // identical output across the knob's whole range in ratio mode.
    val cat = Seq("cefalexin", "paracetamol", "salbutamol", "amoxicillin")
      .map(k => (k, k.toUpperCase)).toDF("key", "generic_name")
    val probes = Seq((1L, 0, "cefalexim"), (2L, 0, "paracetamole"),
      (3L, 0, "salbutamul"), (4L, 0, "zzzzz"))
      .toDF("id", "probe_pos", "probe")
    def run(d: Int) = LookupWaterfall.allMatches(probes, cat,
        LookupWaterfall.referenceConfig.copy(fuzzyMaxDist = d))
      .select("id", "probe", "key", "leg", "score")
      .collect().map(_.toSeq).toSet
    val base = run(2)
    assert(run(0) == base, "fuzzyMaxDist=0 changed ratio-mode output")
    assert(run(99) == base, "fuzzyMaxDist=99 changed ratio-mode output")
    assert(base.exists(r => r(0) == 1L && r(2) == "cefalexin"))
  }

  test("exact_probe probes never reach the prefix or fuzzy legs") {
    import spark.implicits._
    // the probe-side mirror of exact_only (RateParitySpec caught the
    // leak this pins): a pipe-joined mixture component key is an exact
    // equality lookup in the reference (tagger.py:327-360) — without
    // the flag, 'budesonide|formoterol'-style keys fuzzy-match nearby
    // generics-universe keys at ratio >= 85
    val cat = Seq(
      ("budesonide + formoterol", "BUDESONIDE + FORMOTEROL"),
      ("paracetamol", "PARACETAMOL"))
      .toDF("key", "generic_name")
    val probes = Seq(
      (1L, 0, "budesonide|formoterol", true), // mixture key: exact only
      (2L, 0, "budesonide + formoterall", false)) // control: fuzzy allowed
      .toDF("id", "probe_pos", "probe", "exact_probe")
    val hits = LookupWaterfall.allMatches(probes, cat,
        LookupWaterfall.referenceConfig)
      .select("id", "leg").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(!hits.exists(_._1 == 1L),
      "exact-only probe leaked into a non-exact leg")
    assert(hits.contains((2L, 3)), "control probe should fuzzy-match")
  }

  test("vaccine acronym expansion does NOT probe component-named catalogs") {
    import spark.implicits._
    val cat = Seq(
      ("diphtheria + pertussis + tetanus", "DTP VACCINE", "J07AJ52"),
      ("dtp vaccine", "DTP VACCINE", "J07AJ52"),
      ("paracetamol", "PARACETAMOL", "N02BE01"))
      .toDF("key", "generic_name", "atc_code")
    // The reference's acronym expansion (tagger.py:684-699) only warms
    // the batch lookup cache — the per-text match loop (tagger.py:
    // 728-771) probes stripped generics and combo keys only, so the
    // acronym text resolves through its own "DTP VACCINE" key, never
    // through the component combo (e2e golden: component-only catalogs
    // give no_candidates for acronym texts).
    val out = DrugTagger.tagTexts(spark,
        Seq((1L, "DTP VACCINE 0.5ML AMPULE")).toDF("id", "text"), cat)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("key"), r.getAs[String]("atc_code"))).toMap
    assert(out(1L) == (("dtp vaccine", "J07AJ52")))
  }

  test("mixture component-key probes hit component-keyed catalogs") {
    val out = tag(Seq((1L, "LAMIVUDINE + ZIDOVUDINE 150MG/300MG TABLET")))
    assert(out(1L) == ("exact", "J05AR01"))
  }

  test("brand swap resolves brand-only texts (BIOGESIC -> PARACETAMOL)") {
    import spark.implicits._
    val out = DrugTagger.tagTexts(spark,
        Seq((1L, "BIOGESIC 500MG TAB")).toDF("id", "text"), catalog,
        brandMap = Map("BIOGESIC" -> "PARACETAMOL"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("match_reason"), r.getAs[String]("atc_code"))).toMap
    assert(out(1L) == ("exact", "N02BE01"))
    // without the map: no match
    val bare = tag(Seq((2L, "BIOGESIC 500MG TAB")))
    assert(bare(2L)._1 == "no_match")
  }
}
