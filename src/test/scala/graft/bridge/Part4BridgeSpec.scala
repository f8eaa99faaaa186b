package graft.bridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end Part-4 tests with full dose-key semantics: IV diluent
  * classes, concentration packaging-volume flexibility, dose-string
  * parsing through getDoseKey, NSS inference.
  */
class Part4BridgeSpec extends SparkSpec {

  private def withKey(df: DataFrame): DataFrame =
    df.withColumn("dose_key", Part4Bridge.doseKeyUdf(
      col("drug_amount_mg"), col("concentration_mg_per_ml"),
      col("iv_diluent_type"), col("total_volume_ml"), col("dose"),
      col("description"), col("generic_key")))

  private lazy val catalog: DataFrame = {
    import spark.implicits._
    withKey(Seq(
      // drug_code, generic, mg, conc, ivType, vol, dose, desc, form, routes
      ("DC1", "paracetamol", 500.0: java.lang.Double, null: java.lang.Double,
        null: String, null: java.lang.Double, null: String, "", "TABLET", "ORAL"),
      ("DC2", "dextrose", null: java.lang.Double, 50.0: java.lang.Double,
        "SODIUM CHLORIDE", 250.0: java.lang.Double, null: String, "",
        "SOLUTION", "INTRAVENOUS"),
      ("DC3", "salbutamol", null: java.lang.Double, null: java.lang.Double,
        null: String, null: java.lang.Double, "2MG/5ML 60ML", "",
        "SYRUP", "ORAL"),
      ("DC4", "sodium chloride", null: java.lang.Double, null: java.lang.Double,
        null: String, null: java.lang.Double, "500ML", "PNSS 500ML",
        "SOLUTION", "INTRAVENOUS"))
      .toDF("drug_code", "generic_key", "drug_amount_mg",
        "concentration_mg_per_ml", "iv_diluent_type", "total_volume_ml",
        "dose", "description", "form", "route"))
      .select("generic_key", "drug_code", "dose_key", "form", "route", "description")
  }

  private def run(rows: Seq[(Long, String, java.lang.Double, java.lang.Double,
      String, java.lang.Double, String, String, String, String)]) = {
    import spark.implicits._
    val items = withKey(rows.toDF("id", "generic_key", "drug_amount_mg",
      "concentration_mg_per_ml", "iv_diluent_type", "total_volume_ml",
      "dose", "description", "form", "route"))
      .select("id", "generic_key", "dose_key", "form", "route")
    Part4Bridge.matchDrugCodes(items, catalog).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("drug_code"),
        r.getAs[String]("drug_code_match_reason"))).toMap
  }

  test("IV solutions match on concentration + diluent class + volume") {
    val out = run(Seq(
      (1L, "dextrose", null, 50.0, "0.9% NACL", 250.0, null, "", "SOLUTION",
        "INTRAVENOUS"),
      // different diluent class: water-based D5 does not match saline-based
      (2L, "dextrose", null, 50.0, "WFI", 250.0, null, "", "SOLUTION",
        "INTRAVENOUS")))
    assert(out(1L) == (("DC2", "matched_perfect")))
    assert(out(2L)._2 == "no_perfect_match:dose_mismatch")
  }

  test("concentration keys ignore bottle volume (packaging)") {
    val out = run(Seq(
      (1L, "salbutamol", null, null, null, null, "2MG/5ML 120ML", "",
        "SYRUP", "ORAL")))
    // 0.4 mg/mL in a 120 mL bottle still matches the 60 mL catalog row
    assert(out(1L) == (("DC3", "matched_perfect")))
  }

  test("plain-NSS inference matches saline catalog rows") {
    val out = run(Seq(
      (1L, "sodium chloride", null, null, null, null, "500ML",
        "PNSS 500ML BOTTLE", "SOLUTION", "INTRAVENOUS")))
    assert(out(1L) == (("DC4", "matched_perfect")))
  }

  test("reason cascade still attributes failures") {
    val out = run(Seq(
      (1L, "paracetamol", 999.0, null, null, null, null, "", "TABLET", "ORAL"),
      (2L, "unknown", 500.0, null, null, null, null, "", "TABLET", "ORAL"),
      (3L, "paracetamol", null, null, null, null, null, "", "TABLET", "ORAL")))
    assert(out(1L)._2 == "no_perfect_match:dose_mismatch")
    assert(out(2L)._2 == "generic_not_in_annex")
    assert(out(3L)._2 == "no_perfect_match:no_dose_in_esoa")
  }

  test("form equivalence is route-aware (TAB alias vs TABLET)") {
    val out = run(Seq(
      (1L, "paracetamol", 500.0, null, null, null, null, "", "TAB", "ORAL")))
    assert(out(1L) == (("DC1", "matched_perfect")))
  }

  test("missing form/route on either side is compatible (reference semantics)") {
    // runners.py:1195-1206 / 1298-1300: sparse ESOA rows still reach
    // matched_perfect when only the dose key is verifiable
    val out = run(Seq(
      (1L, "paracetamol", 500.0, null, null, null, null, "", null, null),
      (2L, "paracetamol", 500.0, null, null, null, null, "", "", "")))
    assert(out(1L) == (("DC1", "matched_perfect")))
    assert(out(2L) == (("DC1", "matched_perfect")))
  }

  test("route synonym groups bridge IV vs PARENTERAL") {
    // catalog DC2 is INTRAVENOUS; an item tagged PARENTERAL must match
    // through the route groups (runners.py:1309-1341)
    val out = run(Seq(
      (1L, "dextrose", null, 50.0, "0.9% NACL", 250.0, null, "", "SOLUTION",
        "PARENTERAL")))
    assert(out(1L) == (("DC2", "matched_perfect")))
  }

  test("details score tie-breaks multiple perfect matches") {
    import spark.implicits._
    val cat2 = withKey(Seq(
      ("DCPLAIN", "nifedipine", 30.0: java.lang.Double, null: java.lang.Double,
        null: String, null: java.lang.Double, null: String,
        "NIFEDIPINE 30MG TABLET", "TABLET", "ORAL"),
      ("DCMR", "nifedipine", 30.0: java.lang.Double, null: java.lang.Double,
        null: String, null: java.lang.Double, null: String,
        "NIFEDIPINE 30MG MR TABLET", "TABLET", "ORAL"))
      .toDF("drug_code", "generic_key", "drug_amount_mg",
        "concentration_mg_per_ml", "iv_diluent_type", "total_volume_ml",
        "dose", "description", "form", "route"))
      .select("generic_key", "drug_code", "dose_key", "form", "route", "description")
    val items = withKey(Seq(
      (1L, "nifedipine", 30.0: java.lang.Double, null: java.lang.Double,
        null: String, null: java.lang.Double, null: String, "", "TABLET", "ORAL"))
      .toDF("id", "generic_key", "drug_amount_mg", "concentration_mg_per_ml",
        "iv_diluent_type", "total_volume_ml", "dose", "description", "form",
        "route"))
      .withColumn("release_details", lit("MR"))
      .select("id", "generic_key", "dose_key", "form", "route", "release_details")
    val out = Part4Bridge.matchDrugCodes(items, cat2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("drug_code")).toMap
    // both rows match dose+form+route; MR in the description scores -10
    assert(out(1L) == "DCMR")
  }
}
