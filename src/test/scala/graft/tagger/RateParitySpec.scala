package graft.tagger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.refbuild.UnifiedReference

/** Aggregate match-rate parity at corpus scale (~5k rows).
  *
  * [[E2EReferenceParitySpec]] pins cell-for-cell parity on ~150 curated
  * texts; the reference's PUBLISHED metrics are aggregate match rates at
  * 146k rows (BASELINE.md), and nothing in between checked that the
  * RATES agree when the same text families mix at volume.
  * `tools/gen_rate_golden.py` synthesizes a seeded 5,000-row corpus from
  * the same vocabulary families, runs the REAL reference over it, and
  * pins only the aggregates; this spec re-tags the corpus with
  * [[ScoredTagger.tagTexts]] and asserts every count matches EXACTLY:
  * match_reason distribution, floored match_score distribution, presence
  * counts (atc/drugbank/dose/form/route), distinct matched generics, and
  * total rows. A leg that silently starts matching more or less often
  * moves a count here even when no curated case catches it.
  */
class RateParitySpec extends SparkSpec {

  private def readCsv(path: String): DataFrame =
    spark.read.option("header", "true")
      .csv(getClass.getResource(path).toString)

  /** Mirror of the generator's `present`: null, empty and the
    * reference's literal "None" ATC payload all count as absent.
    */
  private def present(v: Any): Boolean =
    v != null && { val s = String.valueOf(v); s.nonEmpty && s != "None" }

  test("5k-corpus aggregate match rates equal the reference's exactly") {
    val generics = readCsv("/graft/e2e/unified_generics.csv")
    val atcMap = readCsv("/graft/e2e/unified_atc.csv")
    val mixtures = readCsv("/graft/e2e/unified_mixtures.csv")
    val catalog =
      UnifiedReference.buildTaggerCatalog(generics, atcMap, Some(mixtures))
    val brandMap = UnifiedReference.buildBrandMap(
      readCsv("/graft/e2e/unified_brands.csv"), generics)
    val synonymMap = UnifiedReference.buildSynonymMap(
      readCsv("/graft/e2e/unified_synonyms.csv"))

    val texts = readCsv("/graft/rate/rate_texts.csv")
      .select(col("id").cast("long").as("id"),
        coalesce(col("text"), lit("")).as("text"))

    val tagged = ScoredTagger.tagTexts(spark, texts, catalog,
      brandMap = brandMap, synonyms = synonymMap)
      .select("match_reason", "match_score", "atc_code", "drugbank_id",
        "dose", "form", "route", "generic_name")
      .collect()

    val counts = scala.collection.mutable.Map.empty[String, Long]
    def bump(k: String): Unit = counts(k) = counts.getOrElse(k, 0L) + 1
    val distinctGenerics = scala.collection.mutable.Set.empty[String]
    tagged.foreach { r =>
      bump(s"reason:${r.getAs[String]("match_reason")}")
      val sc = r.get(r.fieldIndex("match_score"))
      val bucket =
        if (present(sc)) String.valueOf(sc).toDouble.toInt else -1
      bump(s"score:$bucket")
      Seq("atc_code", "drugbank_id", "dose", "form", "route").foreach { c =>
        if (present(r.get(r.fieldIndex(c)))) bump(s"${c}_present")
      }
      val g = r.get(r.fieldIndex("generic_name"))
      if (present(g)) distinctGenerics += String.valueOf(g)
    }
    counts("rows") = tagged.length.toLong
    counts("distinct_generics") = distinctGenerics.size.toLong

    val golden = readCsv("/graft/rate/rate_golden.csv").collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[String]("count").toLong)
      .toMap

    val keys = (golden.keySet ++ counts.keySet).toSeq.sorted
    val diffs = keys.flatMap { k =>
      val want = golden.getOrElse(k, 0L)
      val got = counts.getOrElse(k, 0L)
      if (want != got) Some(s"$k: reference=$want graft=$got") else None
    }
    assert(diffs.isEmpty,
      s"\n${diffs.size} aggregate-rate divergences from the reference " +
        s"at 5k rows:\n" + diffs.mkString("\n"))
  }
}
