package graft.refbuild

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Fixture tests for the unified reference builders: layering precedence,
  * canonical DrugBank-id overwrite, FDA-before-DrugBank brand dedup,
  * synonym aggregation, mixture component-key dedup.
  */
class UnifiedReferenceSpec extends SparkSpec {

  import spark.implicits._

  private def dbGenerics: DataFrame = Seq(
    ("DB001", "Paracetamol", "paracetamol"),
    ("DB002", "ibuprofen ", "ibuprofen"))
    .toDF("drugbank_id", "generic_name", "name_key")

  private def whoAtc: DataFrame = Seq(
    ("N02BE01", "PARACETAMOL"),     // already present -> not added
    ("J01CA04", "Amoxicillin"))     // new -> added as who
    .toDF("atc_code", "atc_name")

  test("buildGenerics layers sources add-only-if-absent") {
    val out = UnifiedReference.buildGenerics(spark, dbGenerics, whoAtc, None)
      .collect().map(r => r.getAs[String]("generic_name") ->
        (r.getAs[String]("drugbank_id"), r.getAs[String]("source"))).toMap
    assert(out("PARACETAMOL") == (("DB001", "drugbank")))
    assert(out("IBUPROFEN") == (("DB002", "drugbank")))
    assert(out("AMOXICILLIN") == ((null, "who")))
  }

  test("canonical entries with a DrugBank id overwrite in place") {
    // AMOXICILLIN + CLAVULANIC ACID -> DB00766 comes from the canonical CSV
    val who = Seq(("J01CR02", "Amoxicillin + Clavulanic Acid"))
      .toDF("atc_code", "atc_name")
    val out = UnifiedReference.buildGenerics(spark, dbGenerics, who, None)
      .collect().map(r => r.getAs[String]("generic_name") ->
        (r.getAs[String]("drugbank_id"), r.getAs[String]("source"))).toMap
    assert(out("AMOXICILLIN + CLAVULANIC ACID") == (("DB00766", "canonical")))
    // canonical-only entries without ids also land
    assert(out.contains("COTRIMOXAZOLE"))
  }

  test("buildSynonyms aggregates sorted pipe-joined distinct synonyms") {
    val syn = Seq(("DB001", "Tylenol"), ("DB001", "acetaminophen"),
      ("DB001", "TYLENOL"), ("DB002", "advil"))
      .toDF("drugbank_id", "synonyms")
    val out = UnifiedReference.buildSynonyms(syn, dbGenerics)
      .collect().map(r => r.getAs[String]("drugbank_id") ->
        r.getAs[String]("synonyms")).toMap
    assert(out("DB001") == "ACETAMINOPHEN|TYLENOL")
    assert(out("DB002") == "ADVIL")
  }

  test("buildBrands: FDA wins over DrugBank on the same brand") {
    val fda = Seq(("Biogesic", "Paracetamol")).toDF("brand_name", "generic_name")
    val db = Seq(("BIOGESIC", "DB999"), ("Advil", "DB002"))
      .toDF("brand_name", "drugbank_id")
    val out = UnifiedReference.buildBrands(fda, db, dbGenerics)
      .collect().map(r => r.getAs[String]("brand_name") ->
        (r.getAs[String]("generic_name"), r.getAs[String]("source"))).toMap
    assert(out("BIOGESIC") == (("PARACETAMOL", "fda")))
    assert(out("ADVIL") == (("IBUPROFEN", "drugbank")))
  }

  test("buildAtcMap layers WHO entries not already mapped") {
    val atc = Seq(("DB001", "N02BE01")).toDF("drugbank_id", "atc_code")
    val out = UnifiedReference.buildAtcMap(atc, dbGenerics, whoAtc)
      .collect().map(r => (r.getAs[String]("generic_name"),
        r.getAs[String]("atc_code"), r.getAs[String]("drugbank_id")))
    assert(out.contains(("PARACETAMOL", "N02BE01", "DB001")))
    assert(out.contains(("AMOXICILLIN", "J01CA04", null)))
    // WHO duplicate of an existing (name, atc) pair is not re-added
    assert(out.count(t => t._1 == "PARACETAMOL" && t._2 == "N02BE01") == 1)
  }

  test("buildMixtures dedups per component key keeping first precedence") {
    val mix = Seq(
      ("DB101", "CoAmox", "amoxicillin|clavulanate", "a|c", "amoxicillin|clavulanate", 2),
      ("DB100", "Augmentin", "amoxicillin|clavulanate", "a|c", "amoxicillin|clavulanate", 2),
      ("DB102", "TrioMix", "a|b|c", "a|b|c", "a|b|c", 3))
      .toDF("drugbank_id", "mixture_name", "component_generics",
        "component_keys", "component_key_sorted", "component_count")
    val out = UnifiedReference.buildMixtures(mix).collect()
    assert(out.length == 2)
    val amc = out.find(_.getAs[String]("component_key") ==
      "amoxicillin|clavulanate").get
    assert(amc.getAs[String]("drugbank_id") == "DB100") // min precedence
  }

  test("buildTaggerCatalog assembles generics + mixture keys end-to-end") {
    val generics = UnifiedReference.buildGenerics(spark, dbGenerics, whoAtc, None)
    val atcMap = Seq(
      ("DB001", "PARACETAMOL", "N02BE01"),
      ("DB001", "PARACETAMOL", "N02BE51"))
      .toDF("drugbank_id", "generic_name", "atc_code")
    val mixtures = Seq(
      ("DBMIX", "AMOXICILLIN + CLAVULANIC ACID", "amoxicillin|clavulanate",
        "amoxicillin|clavulanate"))
      .toDF("drugbank_id", "mixture_name", "component_key",
        "component_generics")
    val cat = UnifiedReference.buildTaggerCatalog(generics, atcMap, Some(mixtures))
    val byKey = cat.collect().map(r => r.getAs[String]("key") ->
      (r.getAs[String]("atc_code"), r.getAs[String]("source"),
        r.getAs[Boolean]("fallback_only"))).toMap
    // generic row with pipe-aggregated ATC payload, lowercase key
    assert(byKey("paracetamol") == (("N02BE01|N02BE51", "drugbank", false)))
    // J11 component-key row and J12 fallback name row (both exact-only
    // fallbacks; the component row carries the _lookup_mixture source
    // marker, tagger.py:345-356)
    assert(byKey("amoxicillin|clavulanate") ==
      ((null, "drugbank_mixture", true)))
    assert(byKey("amoxicillin + clavulanic acid")._3 == true)

    // and the assembled catalog drives the tagger end-to-end
    val out = graft.tagger.ScoredTagger.tagTexts(spark,
      Seq((1L, "PARACETAMOL 500MG TAB")).toDF("id", "text"), cat)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("match_reason"), r.getAs[String]("atc_code"))).toMap
    assert(out(1L) == (("matched", "N02BE01")))
  }
}
