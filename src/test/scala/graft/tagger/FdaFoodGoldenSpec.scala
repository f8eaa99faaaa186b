package graft.tagger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipelines.{DrugsTaggingPipeline, PipelineRegistry}

/** FDA-food-fallback parity against the REAL reference pair
  * `load_fda_food_lookup` + `check_fda_food_fallback`
  * (`runners.py:1428-1495`, golden via `tools/gen_fdafood_golden.py`):
  * last-write-wins dict-build collisions (cross-row and same-row
  * brand==product), whole-text direct hits, first->=4-char-token partial
  * hits, short-token and multi-token-key non-hits, empty text — plus the
  * C3 chaining contract: the registered pipeline probes ONLY the
  * unmatched residue.
  */
class FdaFoodGoldenSpec extends SparkSpec {

  import spark.implicits._

  private def readCsv(name: String): DataFrame =
    spark.read.option("header", "true")
      .csv(getClass.getResource(s"/graft/fdafood/$name").toString)

  private lazy val registry = readCsv("food_registry.csv")
    .withColumn("row_order", col("row_order").cast("long"))
  private lazy val golden = readCsv("food_golden.csv")

  test("check matches the reference on every golden row") {
    val texts = golden.select(col("id").cast("long").as("id"),
      coalesce(col("text"), lit("")).as("text"))
    val out = FdaFoodFallback.check(spark, texts, registry)
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[String]("food_match_type")).getOrElse(""),
          Option(r.getAs[String]("food_registration")).getOrElse("")))
      .toMap
    val want = golden.collect().map(r => r.getAs[String]("id").toLong ->
      (Option(r.getAs[String]("food_match_type")).getOrElse(""),
        Option(r.getAs[String]("food_registration")).getOrElse("")))
      .toMap
    val diffs = want.keys.toSeq.sorted.flatMap { id =>
      if (out(id) != want(id))
        Some(s"id=$id reference=${want(id)} graft=${out(id)}")
      else None
    }
    assert(diffs.isEmpty, s"\n${diffs.mkString("\n")}")
  }

  test("null registry fields register nothing (intentional NaN divergence)") {
    // pandas str(NaN) would insert a literal 'NAN' lookup key for the
    // null-brand row (runners.py load_fda_food_lookup); graft's
    // null-propagating filter drops the field instead, so a text
    // carrying the token NAN matches only real registrations
    val withNullBrand = registry.unionByName(
      Seq((99L, null.asInstanceOf[String], "Nan Infant Formula", "FR-099"))
        .toDF("row_order", "brand_name", "product_name", "registration_number"))
    val texts = Seq(
      (1L, "NAN"),                  // would direct-hit the pandas 'NAN' hole
      (2L, "NAN4 MILK SUPPLEMENT"), // no >=4-char token matches either
      (3L, "NAN INFANT FORMULA"))   // whole-text hit on the PRODUCT key
      .toDF("id", "text")
    val out = FdaFoodFallback.check(spark, texts, withNullBrand)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("food_match_type"))).toMap
    assert(out(1L).isEmpty, "the null-brand hole must not register a NAN key")
    assert(out(2L).isEmpty)
    // the non-null product field of the same row still registers normally
    assert(out(3L).contains("fda_food_product"))
  }

  test("registered pipeline chains the fallback over the unmatched residue only") {
    val catalog = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq(("paracetamol", "PARACETAMOL", "N02BE01", "DB00316", "TABLET",
        "ORAL", "who", "PARACETAMOL 500 MG TABLET"))
        .toDF("key", "generic_name", "atc_code", "drugbank_id", "form",
          "route", "source", "reference_text")
    }
    // golden texts (all no_candidates vs this catalog) + one drug-matched
    // row that must NOT probe the registry even though its text carries a
    // registered food token (SUSTAGEN)
    val texts = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      golden.select(col("id").cast("long").as("id"),
        coalesce(col("text"), lit("")).as("text"))
        .unionByName(Seq((100L, "PARACETAMOL 500MG TABLET SUSTAGEN"))
          .toDF("id", "text"))
    }
    val reg = new PipelineRegistry
    reg.register(new DrugsTaggingPipeline(texts, catalog,
      fdaFood = Some(_ => registry)))
    val (out, _) = reg.run(spark, "DrugsAndMedicine")
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("match_reason"),
        Option(r.getAs[String]("food_match_type")).getOrElse(""),
        Option(r.getAs[String]("food_registration")).getOrElse("")))
      .toMap
    out.unpersist()
    // the matched row carries no food columns
    assert(got(100L)._1 == "matched")
    assert(got(100L)._2 == "" && got(100L)._3 == "")
    // every residue row reproduces the reference fallback verdict
    val want = golden.collect().map(r => r.getAs[String]("id").toLong ->
      (Option(r.getAs[String]("food_match_type")).getOrElse(""),
        Option(r.getAs[String]("food_registration")).getOrElse("")))
      .toMap
    val diffs = want.keys.toSeq.sorted.flatMap { id =>
      val (reason, t, g) = got(id)
      if (reason == "matched") Some(s"id=$id unexpectedly drug-matched")
      else if ((t, g) != want(id))
        Some(s"id=$id reference=${want(id)} graft=${(t, g)}")
      else None
    }
    assert(diffs.isEmpty, s"\n${diffs.mkString("\n")}")
  }
}
