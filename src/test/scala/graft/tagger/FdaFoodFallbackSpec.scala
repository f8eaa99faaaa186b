package graft.tagger

import graft.SparkSpec

class FdaFoodFallbackSpec extends SparkSpec {

  import spark.implicits._

  private lazy val food = Seq(
    ("ENSURE", "Ensure Gold Powder", "FR-001"),
    ("-", "Pedialyte Solution", "FR-002"),
    ("SUSTAGEN", "-", "FR-003"))
    .toDF("brand_name", "product_name", "registration_number")

  test("direct whole-text match beats token probing") {
    val out = FdaFoodFallback.check(spark,
      Seq((1L, "ensure")).toDF("id", "text"), food)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("food_match_type"), r.getAs[String]("food_registration")))
      .toMap
    assert(out(1L) == (("fda_food_brand", "FR-001")))
  }

  test("token probe (>=4 chars) attributes partial matches; misses stay null") {
    val out = FdaFoodFallback.check(spark, Seq(
        (1L, "SUSTAGEN CHOCOLATE 1KG"),
        (2L, "PEDIALYTE SOLUTION 500ML"),   // via product_name whole-key token? no — text token PEDIALYTE only
        (3L, "UNKNOWN ITEM")).toDF("id", "text"), food)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("food_match_type"))).toMap
    assert(out(1L) == Some("fda_food_brand_partial"))
    assert(out(2L).isEmpty) // 'PEDIALYTE SOLUTION' key needs both tokens
    assert(out(3L).isEmpty)
  }

  test("short tokens never probe") {
    val out = FdaFoodFallback.check(spark,
      Seq((1L, "ENS 250")).toDF("id", "text"), food)
      .collect().head
    assert(out.getAs[String]("food_match_type") == null)
  }
}
