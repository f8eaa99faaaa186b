package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.bridge.Part4Bridge

/** The end-to-end golden run (SURVEY §5 plan item 4): FIXTURES-style
  * fixtures through registered Part-2/3 tagging and Part-4 bridging,
  * asserting exact outputs and reason distributions.
  */
class DrugsPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def catalog(s: org.apache.spark.sql.SparkSession): DataFrame =
    Seq(
      ("paracetamol", "PARACETAMOL", "N02BE01", "DB00316", "TABLET", "ORAL",
        "who", "PARACETAMOL 500 MG TABLET"),
      ("cefalexin", "CEFALEXIN", "J01DB01", "DB00567", "CAPSULE", "ORAL",
        "who", "CEFALEXIN CAPSULE"),
      ("ibuprofen + paracetamol", "IBUPROFEN + PARACETAMOL", "M01AE51",
        "DBCOMBO", "TABLET", "ORAL", "who", "IBUPROFEN AND PARACETAMOL"))
      .toDF("key", "generic_name", "atc_code", "drugbank_id", "form",
        "route", "source", "reference_text")

  // eSOA-style coverage rows (FIXTURES.md §1): exact, misspelling,
  // brandless combo, noise, non-drug
  private val esoa = Seq(
    (1L, "PARACETAMOL 500MG TABLET"),
    (2L, "CEPHALEXIN 250MG/5ML SYRUP 60ML"),
    (3L, "IBUPROFEN+PARACETAMOL 200MG/325MG TAB"),
    (4L, "CLARITHROMYCIN 500 MG TABLET **"),
    (5L, "SURGICAL GLOVES SIZE 7"))

  test("registered pipeline runs Parts 2/3 with phase metrics") {
    val reg = new PipelineRegistry
    reg.register(new DrugsTaggingPipeline(
      s => { import s.implicits._; esoa.toDF("id", "text") }, catalog,
      // CEPHALEXIN -> CEFALEXIN comes from the unified_synonyms TABLE in
      // real catalogs (the static tagger dict has no such pair —
      // tagger.py:209-213); modeled as a table-synonym entry here
      synonyms = Map("CEPHALEXIN" -> "CEFALEXIN")))
    val (out, metrics) = reg.run(spark, "DrugsAndMedicine")
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("match_reason"), r.getAs[String]("atc_code"))).toMap
    assert(got(1L) == (("matched", "N02BE01")))
    assert(got(2L) == (("matched", "J01DB01"))) // table-synonym spelling
    assert(got(3L) == (("matched", "M01AE51"))) // combo key
    assert(got(4L)._1 == "no_candidates")       // not in catalog
    assert(got(5L)._1 == "no_candidates")
    assert(metrics.map(_.phase) ==
      Seq("pre_run", "prepare", "match", "post_run"))
    assert(metrics.find(_.phase == "match").exists(_.rows == 5L))
    out.unpersist()
  }

  test("prepareInputs resolves a reference-candidate text column to `text`") {
    // a frame arriving as (id, ITEM_DESCRIPTION) — the reference's probe
    // list (runners.py:176-182) — must tag identically to (id, text)
    val reg = new PipelineRegistry
    reg.register(new DrugsTaggingPipeline(
      s => { import s.implicits._; esoa.toDF("id", "ITEM_DESCRIPTION") },
      catalog,
      synonyms = Map("CEPHALEXIN" -> "CEFALEXIN")))
    val (out, _) = reg.run(spark, "DrugsAndMedicine")
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      r.getAs[String]("match_reason")).toMap
    assert(got(1L) == "matched" && got(2L) == "matched" && got(3L) == "matched")
    out.unpersist()
    // and a frame with NO recognizable text column fails loudly at prepare
    val reg2 = new PipelineRegistry
    reg2.register(new DrugsTaggingPipeline(
      s => { import s.implicits._; esoa.toDF("id", "note") }, catalog))
    val e = intercept[IllegalArgumentException](reg2.run(spark, "DrugsAndMedicine"))
    assert(e.getMessage.contains("No text column found"))
  }

  test("fallback branch pins the tagger to one materialization") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val registry = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq(("ENSURE", "Ensure Gold Powder", "FR-001"))
        .toDF("brand_name", "product_name", "registration_number")
    }
    val reg = new PipelineRegistry
    reg.register(new DrugsTaggingPipeline(
      s => { import s.implicits._; esoa.toDF("id", "text") }, catalog,
      synonyms = Map("CEPHALEXIN" -> "CEFALEXIN"),
      fdaFood = Some(registry)))
    val (out, _) = reg.run(spark, "DrugsAndMedicine")
    // the residue-derive and the rejoin both consume the tagger output;
    // the local checkpoint truncates its lineage to ONE materialized RDD,
    // so the final plan must contain no surviving catalog scan (a
    // LocalRelation carrying atc_code would mean the scored-selection
    // subtree is being re-executed per consumer)
    val plan = out.queryExecution.analyzed
    val catalogScans = plan.collect {
      case lr: LocalRelation if lr.output.exists(_.name == "atc_code") => lr
    }
    assert(catalogScans.isEmpty,
      s"tagger lineage appears ${catalogScans.size}x in the final plan")
    assert(plan.toString.contains("LogicalRDD"),
      "expected the checkpointed tagger RDD in the plan")
    out.unpersist()
  }

  test("registered pipeline runs Parts 2/3/4 when an annex is supplied") {
    import graft.bridge.Part4Bridge
    val annex = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq(("paracetamol", "DR-P500", "500MG", "TABLET"))
        .toDF("generic_key", "drug_code", "dose", "form")
        .withColumn("dose_key", Part4Bridge.doseKeyUdf(
          lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("string"), lit(null).cast("double"),
          col("dose"), col("dose"), col("generic_key")))
        .withColumn("route", lit("ORAL"))
        .withColumn("description",
          concat(upper(col("generic_key")), lit(" "), col("dose")))
        .select("generic_key", "drug_code", "dose_key", "form", "route",
          "description")
    }
    val reg = new PipelineRegistry
    reg.register(new DrugsTaggingPipeline(
      s => { import s.implicits._; esoa.toDF("id", "text") }, catalog,
      annex = Some(annex)))
    val (out, _) = reg.run(spark, "DrugsAndMedicine")
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("drug_code"), r.getAs[String]("drug_code_match_reason"))).toMap
    assert(got(1L) == (("DR-P500", "matched_perfect")))
    assert(got(2L)._2 == "generic_not_in_annex") // cefalexin not in annex
    assert(got(5L)._1 == null)                   // no_candidates row: no code
    out.unpersist()
  }

  test("Part-4 bridging chains on the tagged output") {
    val tagged = graft.tagger.ScoredTagger.tagTexts(spark,
      esoa.toDF("id", "text"), catalog(spark),
      synonyms = Map("CEPHALEXIN" -> "CEFALEXIN"))
      .filter(col("match_reason") === "matched")
      .select(col("id"), lower(col("generic_name")).as("generic_key"),
        col("text").as("description"))
      // dose strings as the Part-3 output would carry them (the slash-combo
      // grammar is anchored to dose-only strings, like the reference)
      .withColumn("dose",
        when(col("id") === 1L, "500MG")
          .when(col("id") === 3L, "200MG/325MG")
          .otherwise(lit(null).cast("string")))
      .withColumn("dose_key", Part4Bridge.doseKeyUdf(
        lit(null).cast("double"), lit(null).cast("double"),
        lit(null).cast("string"), lit(null).cast("double"),
        col("dose"), col("description"), col("generic_key")))
      .withColumn("form", lit("TABLET"))
      .withColumn("route", lit("ORAL"))
    val annex = Seq(
      ("paracetamol", "DR-P500", "500MG", "TABLET"),
      ("ibuprofen + paracetamol", "DR-COMBO", "200MG+325MG", "TABLET"))
      .toDF("generic_key", "drug_code", "dose", "form")
      .withColumn("dose_key", Part4Bridge.doseKeyUdf(
        lit(null).cast("double"), lit(null).cast("double"),
        lit(null).cast("string"), lit(null).cast("double"),
        col("dose"), col("dose"), col("generic_key")))
      .withColumn("route", lit("ORAL"))
      .withColumn("description", concat(upper(col("generic_key")),
        lit(" "), col("dose"), lit(" "), col("form")))
      .select("generic_key", "drug_code", "dose_key", "form", "route",
        "description")
    val bridged = Part4Bridge.matchDrugCodes(
      tagged.select("id", "generic_key", "dose_key", "form", "route"), annex)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("drug_code"), r.getAs[String]("drug_code_match_reason")))
      .toMap
    assert(bridged(1L) == (("DR-P500", "matched_perfect")))
    // combo dose 200+325=525 total matches the annex combo row
    assert(bridged(3L) == (("DR-COMBO", "matched_perfect")))
    // cefalexin is not in the annex
    assert(bridged(2L)._2 == "generic_not_in_annex")
  }
}
