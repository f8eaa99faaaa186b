package graft.tagger

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.refbuild.UnifiedReference

/** Full Part-2/3 tagger parity against a REAL reference run.
  *
  * `tools/gen_e2e_golden.py` loads the reference implementation
  * standalone, feeds it the synthetic unified_* catalog under
  * `src/test/resources/graft/e2e/` (brands both swap directions, four
  * amlodipine salts for the prefix limit, a typo for the fuzzy leg +
  * correction feedback, mixtures by component key and by name (J12),
  * vaccines, multiword salt-strip guards, IV texts, pure salts,
  * multi-ATC payloads, junk, and duplicates), and pins the reference's
  * ACTUAL 29-column output as `golden.csv`.
  *
  * This spec rebuilds the same catalog with [[UnifiedReference]], runs
  * [[ScoredTagger.tagTexts]] with its reference-parity defaults, and
  * asserts EVERY golden column matches cell-for-cell.
  */
class E2EReferenceParitySpec extends SparkSpec {

  private val Null = "<NULL>"

  private def res(name: String): String =
    getClass.getResource(s"/graft/e2e/$name").toString

  private def readCsv(name: String): DataFrame =
    spark.read.option("header", "true").csv(res(name))

  private val goldenCols = Seq(
    "atc_code", "drugbank_id", "generic_name", "reference_text", "dose",
    "form", "route", "type_details", "release_details", "form_details",
    "match_score", "match_reason", "sources", "salt_details",
    "brand_details", "indication_details", "alias_details",
    "diluent_details", "iv_diluent_type", "iv_diluent_amount",
    "dose_values", "dose_units", "dose_types", "total_volume_ml",
    "drug_amount_mg", "diluent_amount_mg", "concentration_mg_per_ml")

  private val listCols =
    Set("dose_values", "dose_units", "dose_types")

  /** Mirror of the generator's `ser`: None -> <NULL>, lists pipe-joined
    * (empty -> <NULL>), floats via shortest round-trip repr.
    */
  private def ser(col: String, v: Any): String = v match {
    case null => Null
    case s: scala.collection.Seq[_] => if (s.isEmpty) Null else s.map {
      case d: java.lang.Double => d.toString
      case x => String.valueOf(x)
    }.mkString("|")
    case d: java.lang.Double => d.toString
    case x => String.valueOf(x)
  }

  test("tagTexts matches the reference end-to-end, all columns") {
    import spark.implicits._
    val generics = readCsv("unified_generics.csv")
    val atcMap = readCsv("unified_atc.csv")
    val mixtures = readCsv("unified_mixtures.csv")
    val brands = readCsv("unified_brands.csv")
    val catalog =
      UnifiedReference.buildTaggerCatalog(generics, atcMap, Some(mixtures))
    val brandMap = UnifiedReference.buildBrandMap(brands, generics)
    val synonymMap =
      UnifiedReference.buildSynonymMap(readCsv("unified_synonyms.csv"))
    assert(synonymMap.get("PENICILLIN G").contains("BENZYLPENICILLIN"))
    assert(brandMap == Map(
      "BIOGESIC" -> "ACETAMINOPHEN", "TYLENOL" -> "ACETAMINOPHEN",
      "VENTOLIN" -> "SALBUTAMOL", "GLUCOPHAGE" -> "METFORMIN HYDROCHLORIDE",
      "ADVIL" -> "IBUPROFEN"))

    val texts = readCsv("texts.csv")
      .select(col("id").cast("long").as("id"),
        coalesce(col("text"), lit("")).as("text"))

    val tagged = ScoredTagger.tagTexts(spark, texts, catalog,
      brandMap = brandMap, synonyms = synonymMap)

    val byId: Map[Long, Row] =
      tagged.collect().map(r => r.getAs[Long]("id") -> r).toMap

    val golden = readCsv("golden.csv").collect()
      .map(r => r.getAs[String]("id").toLong -> r).toMap

    assert(byId.keySet == golden.keySet, "row id sets differ")

    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    for (id <- golden.keys.toSeq.sorted) {
      val g = golden(id)
      val o = byId(id)
      val text = g.getAs[String]("input_text")
      for (c <- goldenCols) {
        val want = Option(g.getAs[String](c)).getOrElse(Null)
        val got = ser(c, o.get(o.fieldIndex(c)))
        if (got != want)
          diffs += s"id=$id [$text] $c: reference=$want graft=$got"
      }
    }
    assert(diffs.isEmpty,
      s"\n${diffs.size} cell divergences from the reference run:\n" +
        diffs.take(60).mkString("\n"))
  }
}
