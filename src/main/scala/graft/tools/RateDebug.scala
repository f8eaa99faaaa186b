package graft.tools

import org.apache.spark.sql.functions._

import graft.refbuild.UnifiedReference
import graft.tagger.ScoredTagger

/** Dev aid for RateParitySpec divergences: tags the 5k rate corpus and
  * dumps (id, match_reason, generic_name) to /tmp/graft_rows.csv for a
  * row-level diff against the reference dump.
  */
object RateDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = "src/test/resources/graft"
    def readCsv(p: String) =
      spark.read.option("header", "true").csv(s"$res/$p")
    val generics = readCsv("e2e/unified_generics.csv")
    val catalog = UnifiedReference.buildTaggerCatalog(
      generics, readCsv("e2e/unified_atc.csv"),
      Some(readCsv("e2e/unified_mixtures.csv")))
    val brandMap =
      UnifiedReference.buildBrandMap(readCsv("e2e/unified_brands.csv"), generics)
    val synonyms =
      UnifiedReference.buildSynonymMap(readCsv("e2e/unified_synonyms.csv"))
    val texts = readCsv("rate/rate_texts.csv")
      .select(col("id").cast("long").as("id"),
        coalesce(col("text"), lit("")).as("text"))
    ScoredTagger.tagTexts(spark, texts, catalog,
        brandMap = brandMap, synonyms = synonyms)
      .select(col("id"), col("match_reason"), col("generic_name"),
        col("match_score"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv("/tmp/graft_rows")
    println("wrote /tmp/graft_rows")
    spark.stop()
  }
}
