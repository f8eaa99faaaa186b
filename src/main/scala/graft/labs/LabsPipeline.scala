package graft.labs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Labs pipeline (SURVEY §2.3 J9 + §2.2 P4–P6): prepare Laboratory &
  * Diagnostic rows, then exact-normalized-text match against two catalogs
  * with Labs > Diagnostics > Unmatched precedence
  * (`prepare_labs.py`, `match_labs.py`).
  *
  * Distributed-determinism note (SURVEY §7.4 risk 4): the reference's
  * keep-first dedup rides on CSV row order; here every keep-first is a
  * row_number window over an explicit precedence column.
  */
object LabsPipeline {

  val LabsCode = "LaboratoryAndDiagnostic"
  val ItemExcludeStart = 1540
  val ItemExcludeEnd = 1896

  /** `_normalize` (`match_labs.py:18-26`): lowercase, alnum-only, collapse.
    * Built-in expression chain (codegen'd) — byte-equivalent to
    * TextNorm.normalizeBasic, which the UDF-vs-oracle query q38 proves.
    */
  def normalizeExpr(c: Column): Column =
    trim(regexp_replace(lower(c.cast("string")), "[^a-z0-9]+", " "))

  /** Category + range + blank filters (`prepare_labs.py:36-48`):
    * keep LaboratoryAndDiagnostic, drop ITEM_NUMBER in [1540,1896]
    * (non-numeric ITEM_NUMBERs survive, like pandas to_numeric coerce),
    * drop null/blank descriptions, trim the rest.
    */
  def filterCategory(df: DataFrame): DataFrame = {
    val n = col("ITEM_NUMBER").cast("long")
    df.filter(col("ITEM_REF_CODE").cast("string") === LabsCode)
      .filter(!coalesce(n.between(ItemExcludeStart, ItemExcludeEnd), lit(false)))
      .filter(col("DESCRIPTION").isNotNull)
      .withColumn("DESCRIPTION", trim(col("DESCRIPTION").cast("string")))
      .filter(length(col("DESCRIPTION")) > 0)
  }

  /** Combine multiple sources (CSV/TSV, pre-tagged with SOURCE_FILE and a
    * source precedence), dedup by (ITEM_NUMBER, DESCRIPTION) keeping the
    * earliest source, sort (`prepare_labs.py:56-77`).
    */
  def prepare(sources: Seq[DataFrame]): DataFrame = {
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      filterCategory(df).withColumn("source_precedence", lit(i))
    }
    val combined = tagged.reduce(_.unionByName(_))
    val w = Window.partitionBy("ITEM_NUMBER", "DESCRIPTION")
      .orderBy("source_precedence")
    combined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "source_precedence")
      .orderBy("ITEM_NUMBER", "DESCRIPTION")
  }

  /** First-row-per-key catalog lookup (`match_labs.py:29-36` setdefault
    * semantics) with an explicit precedence order.
    */
  private def keyedFirst(df: DataFrame, textCol: String,
      precedence: Seq[Column]): DataFrame = {
    val w = Window.partitionBy("norm_key").orderBy(precedence: _*)
    df.withColumn("norm_key", normalizeExpr(col(textCol)))
      .filter(length(col("norm_key")) > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Two-catalog precedence matcher (`match_labs.py:57-108`): exact match
    * on normalized description; Labs wins over Diagnostics wins over
    * Unmatched; output schema mirrors FIXTURES.md §4.
    */
  def matchRecords(esoa: DataFrame, master: DataFrame,
      diagnostics: DataFrame): DataFrame = {
    val m = broadcast(keyedFirst(
        master.select(col("ITEM_NUMBER").as("lab_item_number"),
          col("IS_OFFICIAL").as("lab_is_official"),
          col("DESCRIPTION").as("lab_description")),
        "lab_description", Seq(col("lab_item_number"))))
    val d = broadcast(keyedFirst(
        diagnostics.select(col("code").as("diagnostics_code"),
          col("desc").as("diagnostics_desc"), col("cat").as("diagnostics_cat"),
          col("spec").as("diagnostics_spec"), col("etc").as("diagnostics_etc"),
          col("misc").as("diagnostics_misc")),
        "diagnostics_desc", Seq(col("diagnostics_code"))))
    esoa
      .withColumn("normalized_description", normalizeExpr(col("DESCRIPTION")))
      .join(m, col("normalized_description") === m("norm_key"), "left")
      .drop(m("norm_key"))
      .join(d, col("normalized_description") === d("norm_key"), "left")
      .drop(d("norm_key"))
      .withColumn("match_source",
        when(col("lab_description").isNotNull, "Labs")
          .when(col("diagnostics_desc").isNotNull, "Diagnostics")
          .otherwise("Unmatched"))
      .withColumn("standard_description",
        coalesce(col("lab_description"), col("diagnostics_desc"),
          col("DESCRIPTION")))
      // reference nulls diagnostics columns when Labs wins (elif branch)
      .withColumn("diagnostics_code", whenNotLabs(col("diagnostics_code")))
      .withColumn("diagnostics_desc", whenNotLabs(col("diagnostics_desc")))
      .withColumn("diagnostics_cat", whenNotLabs(col("diagnostics_cat")))
      .withColumn("diagnostics_spec", whenNotLabs(col("diagnostics_spec")))
      .withColumn("diagnostics_etc", whenNotLabs(col("diagnostics_etc")))
      .withColumn("diagnostics_misc", whenNotLabs(col("diagnostics_misc")))
      .select("ITEM_NUMBER", "DESCRIPTION", "normalized_description",
        "match_source", "standard_description", "SOURCE_FILE",
        "lab_item_number", "lab_is_official", "lab_description",
        "diagnostics_code", "diagnostics_desc", "diagnostics_cat",
        "diagnostics_spec", "diagnostics_etc", "diagnostics_misc")
      .orderBy("ITEM_NUMBER")
  }

  private def whenNotLabs(c: Column): Column =
    when(col("match_source") === "Labs", lit(null)).otherwise(c)
}
