package graft.tagger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FDA food fallback (SURVEY §2.9 C3, `runners.py:1428-1495`): texts that
  * failed drug tagging probe the FDA food registry — whole-text exact
  * match first, then any token of length >= 4 (partial). Classic two-leg
  * anti-join-chained broadcast lookup.
  */
object FdaFoodFallback {

  /** (brand_name/product_name, registration_number) rows -> lookup frame
    * with match-type tags (`load_fda_food_lookup`). The reference builds a
    * plain dict row by row, so on a key collision the LAST assignment in
    * file order wins — and within one row the product assignment follows
    * the brand assignment (brand == product -> product wins). Encoded as
    * a window keeping the max (row_order, field_order) entry per key.
    * Registries carrying an explicit `row_order` column replay file order
    * exactly; otherwise `monotonically_increasing_id` stands in (exact
    * for the single-file broadcast-sized registries this models, since
    * partition ids follow file offsets).
    *
    * INTENTIONAL divergence from the reference on missing registry
    * fields: pandas' `str(NaN)` turns a missing brand/product into the
    * literal key `'NAN'` (and can emit `nan` registration numbers), so a
    * text containing the token `NAN` would "match" the registry hole.
    * Here the null-propagating `upper(trim(col))` filter drops null
    * brand/product rows instead — a missing field registers nothing.
    * Pinned by FdaFoodGoldenSpec's null-brand-row test.
    */
  def buildLookup(foodDf: DataFrame): DataFrame = {
    val ordered =
      if (foodDf.columns.contains("row_order")) foodDf
      else foodDf.withColumn("row_order", monotonically_increasing_id())
    val brand = ordered
      .select(upper(trim(col("brand_name"))).as("food_key"),
        col("registration_number").as("registration"),
        lit("fda_food_brand").as("food_type"),
        col("row_order"), lit(0).as("field_order"))
      .filter(col("food_key") =!= "" && col("food_key") =!= "-")
    val product = ordered
      .select(upper(trim(col("product_name"))).as("food_key"),
        col("registration_number").as("registration"),
        lit("fda_food_product").as("food_type"),
        col("row_order"), lit(1).as("field_order"))
      .filter(col("food_key") =!= "" && col("food_key") =!= "-")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("food_key")
      .orderBy(col("row_order").desc, col("field_order").desc)
    brand.unionByName(product)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn", "row_order", "field_order")
  }

  /** @param texts (id, text) rows — typically the no_candidates/no_match
    *              residue of the drug tagger
    * @return id, text + food_match_type (nullable), food_registration
    */
  def check(spark: SparkSession, texts: DataFrame, foodDf: DataFrame): DataFrame = {
    val lookup = broadcast(buildLookup(foodDf))
    val up = texts.withColumn("_up", upper(trim(col("text"))))

    val direct = up.join(lookup, col("_up") === col("food_key"))
      .select(col("id"), col("food_type").as("food_match_type"),
        col("registration").as("food_registration"))

    val missDirect = up.join(direct.select("id"), Seq("id"), "left_anti")
    val tokenHits = missDirect
      .select(col("id"), posexplode(split(col("_up"), "\\s+")))
      .toDF("id", "tok_pos", "tok")
      .filter(length(col("tok")) >= 4)
      .join(lookup, col("tok") === col("food_key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("tok_pos", "food_key")
    val partial = tokenHits
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"),
        concat(col("food_type"), lit("_partial")).as("food_match_type"),
        col("registration").as("food_registration"))

    texts.join(direct.unionByName(partial), Seq("id"), "left")
  }
}
