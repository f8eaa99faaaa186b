package graft.labs

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Golden tests mirroring the reference labs fixtures (FIXTURES.md §4):
  * category filter, [1540,1896] exclusion, CSV/TSV dedup precedence,
  * Labs > Diagnostics > Unmatched matching.
  */
class LabsPipelineSpec extends SparkSpec {

  import LabsPipeline._

  private def esoa(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ITEM_NUMBER", "ITEM_REF_CODE", "DESCRIPTION", "SOURCE_FILE")
  }

  test("filterCategory: category + range-exclusion + blank handling") {
    val out = prepare(Seq(esoa(Seq(
      ("100", "LaboratoryAndDiagnostic", "CBC", "a.csv"),
      ("101", "Drugs", "PARACETAMOL", "a.csv"),       // wrong category
      ("1540", "LaboratoryAndDiagnostic", "X-RAY", "a.csv"),  // excluded start
      ("1896", "LaboratoryAndDiagnostic", "MRI", "a.csv"),    // excluded end
      ("1897", "LaboratoryAndDiagnostic", "  CT SCAN  ", "a.csv"), // kept+trim
      ("102", "LaboratoryAndDiagnostic", "   ", "a.csv")))))  // blank
    val got = out.collect().map(r =>
      (r.getAs[String]("ITEM_NUMBER"), r.getAs[String]("DESCRIPTION")))
    assert(got.toSeq == Seq(("100", "CBC"), ("1897", "CT SCAN")))
  }

  test("prepare dedups across CSV/TSV keeping the earlier source") {
    val csv = esoa(Seq(("100", "LaboratoryAndDiagnostic", "CBC", "a.csv")))
    val tsv = esoa(Seq(("100", "LaboratoryAndDiagnostic", "CBC", "b.tsv"),
      ("200", "LaboratoryAndDiagnostic", "URINALYSIS", "b.tsv")))
    val out = prepare(Seq(csv, tsv)).collect()
    assert(out.length == 2)
    val cbc = out.find(_.getAs[String]("ITEM_NUMBER") == "100").get
    assert(cbc.getAs[String]("SOURCE_FILE") == "a.csv")
  }

  test("matchRecords: Labs beats Diagnostics beats Unmatched") {
    import spark.implicits._
    val prepared = esoa(Seq(
      ("1", "LaboratoryAndDiagnostic", "Complete Blood Count!!", "a.csv"),
      ("2", "LaboratoryAndDiagnostic", "2D-Echo", "a.csv"),
      ("3", "LaboratoryAndDiagnostic", "Mystery Test", "a.csv")))
    val master = Seq(("900", "1", "COMPLETE BLOOD COUNT"))
      .toDF("ITEM_NUMBER", "IS_OFFICIAL", "DESCRIPTION")
    val diag = Seq(
      ("D1", "complete blood count", "hema", "", "", ""),
      ("D2", "2d echo", "cardio", "", "", ""))
      .toDF("code", "desc", "cat", "spec", "etc", "misc")
    val out = matchRecords(prepared, master, diag).collect()
      .map(r => r.getAs[String]("ITEM_NUMBER") ->
        (r.getAs[String]("match_source"), r.getAs[String]("standard_description"),
          r.getAs[String]("diagnostics_code"))).toMap
    // Labs hit: diagnostics columns stay null even though diag also matches
    assert(out("1") == ("Labs", "COMPLETE BLOOD COUNT", null))
    assert(out("2") == ("Diagnostics", "2d echo", "D2"))
    assert(out("3") == ("Unmatched", "Mystery Test", null))
  }

  test("catalog keep-first per normalized key is deterministic") {
    import spark.implicits._
    val prepared = esoa(Seq(("1", "LaboratoryAndDiagnostic", "CBC", "a.csv")))
    val master = Seq(
      ("902", "0", "CBC"), ("901", "1", "cbc")) // same norm key
      .toDF("ITEM_NUMBER", "IS_OFFICIAL", "DESCRIPTION")
    val diag = Seq.empty[(String, String, String, String, String, String)]
      .toDF("code", "desc", "cat", "spec", "etc", "misc")
    val out = matchRecords(prepared, master, diag).collect().head
    assert(out.getAs[String]("lab_item_number") == "901") // min precedence
  }
}
