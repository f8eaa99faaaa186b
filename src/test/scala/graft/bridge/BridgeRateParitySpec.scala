package graft.bridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipelines.DrugsTaggingPipeline
import graft.refbuild.UnifiedReference

/** Part-4 bridge parity at corpus scale (~2,500 ESOA rows).
  *
  * [[Part4BridgeE2ESpec]] pins the full Part-2/3/4 chain row-for-row on
  * ~56 curated texts; `tools/gen_bridge_rate.py` is its volume twin:
  * a seeded 2,500-row ESOA corpus synthesized from the same families
  * (annex twins, dose-notation rewrites, form swaps, brand swaps,
  * typos, partial names, junk), tagged and bridged by executing the
  * REAL reference against the same annex frame, with every row's
  * (drug_code, drug_code_match_reason) pinned. This spec drives the
  * corpus through the registered [[DrugsTaggingPipeline]] and asserts
  * row-level equality — a bridge leg whose hit RATE drifts (tie-breaks,
  * dose-key cascades, annex fallbacks) diverges here even when every
  * curated case still passes. The tagger-side twin of this insurance is
  * [[graft.tagger.RateParitySpec]], which caught a real fuzzy-leg leak
  * the curated goldens missed.
  */
class BridgeRateParitySpec extends SparkSpec {

  private val Null = "<NULL>"

  private def res(name: String, dir: String = "part4"): String =
    getClass.getResource(s"/graft/$dir/$name").toString

  private def readCsv(path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  test("2.5k-corpus Part-4 codes and reasons equal the reference's row-for-row") {
    val generics = readCsv(res("unified_generics.csv", "e2e"))
    val atcMap = readCsv(res("unified_atc.csv", "e2e"))
    val mixtures = readCsv(res("unified_mixtures.csv", "e2e"))
    val brands = readCsv(res("unified_brands.csv", "e2e"))
    val catalog =
      UnifiedReference.buildTaggerCatalog(generics, atcMap, Some(mixtures))
    val brandMap = UnifiedReference.buildBrandMap(brands, generics)
    val synonymMap = UnifiedReference.buildSynonymMap(
      readCsv(res("unified_synonyms.csv", "e2e")))

    val annexRaw = readCsv(res("annex_f_with_atc.csv"))
      .select(col("Drug Code").as("drug_code_in"),
        coalesce(col("Drug Description"), lit("")).as("text"))
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("drug_code_in"))
        .cast("long"))
    val esoaRaw = readCsv(res("bridge_rate_texts.csv"))
      .select(col("id").cast("long").as("id"),
        coalesce(col("text"), lit("")).as("text"))

    val annexKeysUdf = udf((g: String) => GenericKeys.annexIndexKeys(g))
    val annexF = (s: SparkSession) => {
      val tagged = graft.tagger.ScoredTagger.tagTexts(
        s, annexRaw.select("id", "text"), catalog, brandMap = brandMap,
        synonyms = synonymMap)
      tagged.join(annexRaw.select("id", "drug_code_in"), Seq("id"))
        .withColumn("index_keys", annexKeysUdf(col("generic_name")))
        .filter(size(col("index_keys")) > 0)
        .withColumn("dose_key", Part4Bridge.doseKeyUdf(
          col("drug_amount_mg"), col("concentration_mg_per_ml"),
          col("iv_diluent_type"), col("total_volume_ml"),
          col("dose"), col("text"), coalesce(col("generic_name"), lit(""))))
        .select(col("index_keys"), col("drug_code_in").as("drug_code"),
          col("dose_key"), col("form"), col("route"),
          col("text").as("description"))
    }

    val pipeline = new DrugsTaggingPipeline(
      texts = _ => esoaRaw.select("id", "text"),
      catalog = _ => catalog,
      brandMap = brandMap,
      annex = Some(annexF),
      synonyms = synonymMap)
    val out = pipeline.matchRecords(spark, esoaRaw.select("id", "text"))
      .select("id", "drug_code", "drug_code_match_reason")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[String]("drug_code")).getOrElse(Null),
          Option(r.getAs[String]("drug_code_match_reason")).getOrElse(Null)))
      .toMap

    val golden = readCsv(res("bridge_rate_golden.csv")).collect()
      .map(r => r.getAs[String]("id").toLong ->
        (r.getAs[String]("drug_code"), r.getAs[String]("drug_code_match_reason")))
      .toMap

    assert(out.keySet == golden.keySet, "row id sets differ")
    val diffs = golden.keys.toSeq.sorted.flatMap { id =>
      if (out(id) != golden(id))
        Some(s"id=$id reference=${golden(id)} graft=${out(id)}")
      else None
    }
    assert(diffs.isEmpty,
      s"\n${diffs.size} of ${golden.size} Part-4 rows diverge:\n" +
        diffs.take(20).mkString("\n"))
  }
}
