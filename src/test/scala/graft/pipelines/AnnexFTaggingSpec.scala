package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.refbuild.UnifiedReference

/** Runner-level Annex-F parity against a REAL `run_annex_f_tagging` run
  * (`tools/gen_annexf_golden.py`): the positional merge of tagger results
  * into the annex frame, the matched_* renames, the
  * reorder_columns_after placement, and passthrough of extra annex
  * columns (including a duplicated Drug Code — row identity is the row
  * id, never the code). The golden pins the runner's full merged output:
  * 41 rows x 30 columns, exact column ORDER included.
  */
class AnnexFTaggingSpec extends SparkSpec {

  private val Null = "<NULL>"

  private def res(dir: String, name: String): String =
    getClass.getResource(s"/graft/$dir/$name").toString

  private def readCsv(dir: String, name: String): DataFrame =
    spark.read.option("header", "true").csv(res(dir, name))

  private def ser(v: Any): String = v match {
    case null => Null
    case s: scala.collection.Seq[_] => if (s.isEmpty) Null else s.map {
      case d: java.lang.Double => d.toString
      case x => String.valueOf(x)
    }.mkString("|")
    case d: java.lang.Double => d.toString
    case x => String.valueOf(x)
  }

  test("tagAnnex matches run_annex_f_tagging: all columns, exact order") {
    val catalog = UnifiedReference.buildTaggerCatalog(
      readCsv("e2e", "unified_generics.csv"),
      readCsv("e2e", "unified_atc.csv"),
      Some(readCsv("e2e", "unified_mixtures.csv")))
    val brandMap = UnifiedReference.buildBrandMap(
      readCsv("e2e", "unified_brands.csv"),
      readCsv("e2e", "unified_generics.csv"))
    val synonymMap =
      UnifiedReference.buildSynonymMap(readCsv("e2e", "unified_synonyms.csv"))

    val golden = readCsv("annexf", "golden.csv")
    // the annex input reconstructed from the golden's passthrough columns
    // (Unit Price cast to double: the reference's read_csv infers floats)
    val annex = golden.select(
      col("row_id").cast("long").as("row_id"),
      col("Drug Code"),
      when(col("Drug Description") =!= Null, col("Drug Description"))
        .as("Drug Description"),
      when(col("Unit") =!= Null, col("Unit")).as("Unit"),
      col("Unit Price").cast("double").as("Unit Price"))

    val out = AnnexFTagging.tagAnnex(spark, annex, catalog,
      brandMap = brandMap, synonyms = synonymMap)

    val wantCols = golden.columns.filterNot(_ == "row_id").toSeq
    assert(out.columns.toSeq == wantCols,
      s"column order differs:\n want ${wantCols.mkString(",")}\n got  ${out.columns.mkString(",")}")

    // cell comparison needs row identity, which tagAnnex (like the
    // runner's row_idx drop) removes — re-run tagging keyed on a COPY of
    // the id so row_id survives as a passthrough annex column
    val keep = AnnexFTagging.tagAnnex(spark,
      annex.withColumn("rid_copy", col("row_id")), catalog,
      rowId = "rid_copy",
      brandMap = brandMap, synonyms = synonymMap)

    val byId = keep.collect()
      .map(r => r.getAs[Long]("row_id") -> r).toMap
    val g = golden.collect()
      .map(r => r.getAs[String]("row_id").toLong -> r).toMap
    assert(byId.keySet == g.keySet, "row id sets differ")

    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    for (id <- g.keys.toSeq.sorted; c <- wantCols if c != "row_id") {
      val want = Option(g(id).getAs[String](c)).getOrElse(Null)
      val got = ser(byId(id).get(byId(id).fieldIndex(c)))
      if (got != want)
        diffs += s"row=$id $c: reference=$want graft=$got"
    }
    assert(diffs.isEmpty,
      s"\n${diffs.size} cell divergences from run_annex_f_tagging:\n" +
        diffs.take(60).mkString("\n"))

    // graft extension pinned against the SAME golden: re-tagging the
    // fully tagged frame (markers present -> stale drop fires) must
    // reproduce every golden cell — the reference runner crashes here
    val retag = AnnexFTagging.tagAnnex(spark,
      keep.withColumn("rid2", col("row_id")), catalog,
      rowId = "rid2",
      brandMap = brandMap, synonyms = synonymMap)
    assert(retag.columns.toSeq == keep.columns.toSeq)
    val byId2 = retag.collect().map(r => r.getAs[Long]("row_id") -> r).toMap
    val diffs2 = scala.collection.mutable.ArrayBuffer.empty[String]
    for (id <- g.keys.toSeq.sorted; c <- wantCols if c != "row_id") {
      val want = Option(g(id).getAs[String](c)).getOrElse(Null)
      val got = ser(byId2(id).get(byId2(id).fieldIndex(c)))
      if (got != want) diffs2 += s"row=$id $c: reference=$want retag=$got"
    }
    assert(diffs2.isEmpty,
      s"\n${diffs2.size} re-tag divergences:\n" + diffs2.take(40).mkString("\n"))
  }

  private def miniCatalog = {
    import spark.implicits._
    Seq(("paracetamol", "PARACETAMOL", "N02BE01", "DB00316", "TABLET",
      "ORAL", "who", "PARACETAMOL 500 MG TABLET"))
      .toDF("key", "generic_name", "atc_code", "drugbank_id", "form",
        "route", "source", "reference_text")
  }

  test("re-tagging an already-tagged frame is idempotent (stale columns dropped)") {
    import spark.implicits._
    val annex = Seq(
      (1L, "D001", "PARACETAMOL 500MG TABLET"),
      (2L, "D002", "SURGICAL GLOVES SIZE 7"))
      .toDF("row_id", "Drug Code", "Drug Description")
    val once = AnnexFTagging.tagAnnex(spark,
      annex.withColumn("rid", col("row_id")), miniCatalog, rowId = "rid")
    // `once` carries match_reason/matched_reference_text — the prior-run
    // marker — so the second run drops the stale tag columns and the
    // fresh tag replaces them byte-for-byte. Graft extension: the
    // reference runner CRASHES re-tagging its own output (no stale-drop;
    // see AnnexFTagging.dropStale scaladoc)
    val twice = AnnexFTagging.tagAnnex(spark,
      once.withColumn("rid", col("row_id")), miniCatalog, rowId = "rid")
    assert(twice.columns.toSeq == once.columns.toSeq)
    val a = once.collect().map(r => r.getAs[Long]("row_id") ->
      once.columns.map(c => ser(r.get(r.fieldIndex(c)))).toSeq).toMap
    val b = twice.collect().map(r => r.getAs[Long]("row_id") ->
      twice.columns.map(c => ser(r.get(r.fieldIndex(c)))).toSeq).toMap
    assert(a == b, "re-tag changed cells")
  }

  test("merge-name collision without a prior-run marker fails loudly") {
    import spark.implicits._
    // `route` is a plausible genuine annex column; silently replacing its
    // data with tagger output would be invisible data loss
    val annex = Seq((1L, "PARACETAMOL 500MG TABLET", "WARD-STOCK"))
      .toDF("row_id", "Drug Description", "route")
    val ex = intercept[IllegalArgumentException](
      AnnexFTagging.tagAnnex(spark, annex, miniCatalog))
    assert(ex.getMessage.contains("route"))
  }
}
