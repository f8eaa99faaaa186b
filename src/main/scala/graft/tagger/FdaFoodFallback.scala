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
    * with match-type tags (`load_fda_food_lookup`). Product rows overwrite
    * brand rows on the same key in the reference dict build — encoded
    * here as precedence in the keep-first dedup.
    */
  def buildLookup(foodDf: DataFrame): DataFrame = {
    val brand = foodDf
      .select(upper(trim(col("brand_name"))).as("food_key"),
        col("registration_number").as("registration"),
        lit("fda_food_brand").as("food_type"), lit(1).as("prec"))
      .filter(col("food_key") =!= "" && col("food_key") =!= "-")
    val product = foodDf
      .select(upper(trim(col("product_name"))).as("food_key"),
        col("registration_number").as("registration"),
        lit("fda_food_product").as("food_type"), lit(0).as("prec"))
      .filter(col("food_key") =!= "" && col("food_key") =!= "-")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("food_key").orderBy("prec", "registration")
    brand.unionByName(product)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn", "prec")
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
