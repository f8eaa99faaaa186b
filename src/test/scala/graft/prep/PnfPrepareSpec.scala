package graft.prep

import graft.SparkSpec

/** Golden tests for the PNF prepare projection (FIXTURES.md §2
  * pnf_prepared schema) and the routes_forms helpers (goldens from the
  * reference routes_forms module).
  */
class PnfPrepareSpec extends SparkSpec {

  test("routes_forms helpers reference parity") {
    assert(PnfPrepare.parseFormFromText("paracetamol 500 mg tablet")
      .contains("tablet"))
    assert(PnfPrepare.parseFormFromText("plain text").isEmpty)
    assert(PnfPrepare.extractRouteAndForm("paracetamol 500 mg tablet") ==
      (Some("oral"), Some("tablet"), "form:tablet;impute_route:tablet->oral"))
    assert(PnfPrepare.extractRouteAndForm("ceftriaxone 1 g vial intravenous") ==
      (Some("intravenous"), Some("vial"),
        "form:vial;route:intravenous->intravenous"))
    assert(PnfPrepare.extractRouteAndForm("cream 15 g") ==
      (Some("topical"), Some("cream"), "form:cream;impute_route:cream->topical"))
    assert(PnfPrepare.extractRouteAndForm("plain text") == (None, None, ""))
    assert(PnfPrepare.mapRouteToken("Inj.:") ==
      List("intravenous", "intramuscular", "subcutaneous"))
    assert(PnfPrepare.mapRouteToken("Oral:") == List("oral"))
    assert(PnfPrepare.mapRouteToken("???") == Nil)
  }

  test("preparePnf derives the pnf_prepared projection with route explode") {
    import spark.implicits._
    val pnf = Seq(
      ("Amlodipine (as besilate)", "Oral:", "C08CA01", "10 mg tablet"),
      ("Ceftriaxone (as sodium salt)", "Inj.:", "J01DD04", "1 g vial"),
      ("", "Oral:", "X00XX00", ""))
      .toDF("Molecule", "Route", "ATC Code", "Technical Specifications")
    val out = PnfPrepare.preparePnf(spark, pnf,
      specCol = Some("Technical Specifications"))
    val rows = out.collect()
    // empty molecule dropped; Inj. explodes to 3 routes + 1 oral = 4 rows
    assert(rows.length == 4)
    val amlo = rows.find(_.getAs[String]("generic_id") == "amlodipine").get
    assert(amlo.getAs[String]("generic_normalized") == "AMLODIPINE")
    assert(amlo.getAs[String]("salt_form") == "BESILATE")
    assert(amlo.getAs[String]("route") == "oral")
    assert(amlo.getAs[String]("form") == "tablet")
    assert(amlo.getAs[String]("dose_kind") == "amount")
    assert(amlo.getAs[Double]("strength_mg") == 10.0)
    val cefRoutes = rows.filter(_.getAs[String]("generic_id") == "ceftriaxone")
      .map(_.getAs[String]("route")).toSet
    assert(cefRoutes == Set("intravenous", "intramuscular", "subcutaneous"))
    val cef = rows.find(r => r.getAs[String]("generic_id") == "ceftriaxone").get
    assert(cef.getAs[Double]("strength_mg") == 1000.0)
    assert(cef.getAs[String]("atc_code") == "J01DD04")
  }

  test("preparePnf validates required columns") {
    import spark.implicits._
    val bad = Seq(("x", "y")).toDF("Molecule", "Route")
    intercept[IllegalArgumentException](
      PnfPrepare.preparePnf(spark, bad))
  }
}
