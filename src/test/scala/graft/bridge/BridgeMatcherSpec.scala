package graft.bridge

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Golden tests for the C2 bridge: every reason branch of the reference's
  * cascade (`runners.py:1336-1383`) plus cross-type dose equivalence and
  * deterministic tie-breaking.
  */
class BridgeMatcherSpec extends SparkSpec {

  private def itemsDf(rows: Seq[(Long, String, String, java.lang.Double,
      java.lang.Double, String, String, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "generic_key", "dose_kind", "dose_v1", "dose_v2",
      "dose_unit", "form", "routes")
  }

  private lazy val catalog: DataFrame = {
    import spark.implicits._
    Seq(
      // drug_code, generic, kind, v1, v2, unit, form, routes
      ("DC001", "paracetamol", "mg", 500.0: java.lang.Double, null: java.lang.Double, "mg", "tablet", Seq("oral")),
      ("DC002", "paracetamol", "mg", 250.0: java.lang.Double, null: java.lang.Double, "mg", "tablet", Seq("oral")),
      ("DC003", "paracetamol", "conc", 100.0: java.lang.Double, 5.0: java.lang.Double, "mg", "syrup", Seq("oral")),
      ("DC010", "heparin", "iu", 5000.0: java.lang.Double, null: java.lang.Double, "iu", "injection", Seq("intravenous")),
      ("DC020", "amoxicillin", "mg", 500.0: java.lang.Double, null: java.lang.Double, "mg", "capsule", Seq("oral")),
      // duplicate-strength entries to exercise the tie-break
      ("DC031", "ibuprofen", "mg", 200.0: java.lang.Double, null: java.lang.Double, "mg", "tablet", Seq("oral")),
      ("DC030", "ibuprofen", "mg", 200.0: java.lang.Double, null: java.lang.Double, "mg", "tablet", Seq("oral")))
      .toDF("drug_code", "generic_key", "dose_kind", "dose_v1", "dose_v2",
        "dose_unit", "form", "routes")
  }

  private def run(items: DataFrame): Map[Long, (String, String)] =
    BridgeMatcher.matchDrugCodes(items, catalog)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("drug_code"), r.getAs[String]("drug_code_match_reason")))
      .toMap

  test("perfect match on generic+dose+form+route") {
    val out = run(itemsDf(Seq(
      (1L, "paracetamol", "mg", 500.0, null, "mg", "tablet", Seq("oral")))))
    assert(out(1L) == ("DC001", "matched_perfect"))
  }

  test("cross-type: 500 mg total matches 100 mg/5 mL concentration") {
    val out = run(itemsDf(Seq(
      (1L, "paracetamol", "mg", 500.0, null, "mg", "syrup", Seq("oral")))))
    assert(out(1L) == ("DC003", "matched_perfect"))
  }

  test("reason cascade: each failure mode is attributed") {
    val out = run(itemsDf(Seq(
      (1L, null, "mg", 500.0, null, "mg", "tablet", Seq("oral")),
      (2L, "unknowndrug", "mg", 500.0, null, "mg", "tablet", Seq("oral")),
      (3L, "paracetamol", null, null, null, null, "tablet", Seq("oral")),
      (4L, "paracetamol", "mg", 999.0, null, "mg", "tablet", Seq("oral")),
      (5L, "paracetamol", "mg", 500.0, null, "mg", "gel", Seq("oral")),
      (6L, "paracetamol", "mg", 500.0, null, "mg", "tablet", Seq("topical")))))
    assert(out(1L)._2 == "no_generic")
    assert(out(2L)._2 == "generic_not_in_annex")
    assert(out(3L)._2 == "no_perfect_match:no_dose_in_esoa")
    assert(out(4L)._2 == "no_perfect_match:dose_mismatch")
    assert(out(5L)._2 == "no_perfect_match:form_mismatch")
    assert(out(6L)._2 == "no_perfect_match:route_mismatch")
    assert(Seq(1L, 2L, 3L, 4L, 5L, 6L).forall(out(_)._1 == null))
  }

  test("combined_mismatch: predicates pass on different candidates only") {
    // dose matches DC002 (250 tablet) but form matches only DC003 (syrup):
    // dose_ok>0 via DC002, form_ok>0 via DC003, no single perfect candidate
    val out = run(itemsDf(Seq(
      (1L, "paracetamol", "mg", 250.0, null, "mg", "syrup", Seq("oral")))))
    assert(out(1L)._2 == "no_perfect_match:combined_mismatch")
  }

  test("iu doses only match iu (never mg)") {
    val out = run(itemsDf(Seq(
      (1L, "heparin", "iu", 5000.0, null, "iu", "injection", Seq("intravenous")),
      (2L, "heparin", "mg", 5000.0, null, "mg", "injection", Seq("intravenous")))))
    assert(out(1L) == ("DC010", "matched_perfect"))
    assert(out(2L)._2 == "no_perfect_match:dose_mismatch")
  }

  test("tie-break is deterministic: lexicographic drug_code") {
    val out = run(itemsDf(Seq(
      (1L, "ibuprofen", "mg", 200.0, null, "mg", "tablet", Seq("oral")))))
    assert(out(1L) == ("DC030", "matched_perfect"))
  }

  test("form equivalence groups widen compatibility") {
    val items = itemsDf(Seq(
      (1L, "amoxicillin", "mg", 500.0, null, "mg", "cap", Seq("oral"))))
    val strict = run(items)
    assert(strict(1L)._2 == "no_perfect_match:form_mismatch")
    val grouped = BridgeMatcher.matchDrugCodes(items, catalog,
        formGroups = Map("cap" -> "capsule_group", "capsule" -> "capsule_group"))
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("drug_code_match_reason")).toMap
    assert(grouped(1L) == "matched_perfect")
  }
}
