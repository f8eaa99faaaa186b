package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.pipelines.AnnexFTagging

/** Oracle-checked exercise of the Part-2 runner's merge algebra
  * (`runners.py:81-112` via [[graft.pipelines.AnnexFTagging.mergeTagged]]):
  * stale-column drop on a previously tagged frame, 1:1 left merge of the
  * tagger result columns, the matched_* renames and reference-text
  * placement. The tagger itself is golden-checked (AnnexFTaggingSpec, q26);
  * here a SQL-expressible stand-in tagger frame lets DuckDB hash-check the
  * runner surface at sf scale.
  *
  * The annex side deliberately carries a prior run's `match_reason` /
  * `dose` / `matched_reference_text` columns ("STALE" sentinels): if the
  * drop-then-merge ever regressed, the stale values would surface (or the
  * join would die ambiguous) and the hash would break. One third of the
  * rows miss the tagged frame, pinning left-join null semantics.
  */
object Runner {

  private val nullStr = Seq("type_details", "release_details", "form_details",
    "salt_details", "brand_details", "indication_details", "alias_details",
    "diluent_details", "iv_diluent_type", "dose_values", "dose_units",
    "dose_types")
  private val nullDbl = Seq("iv_diluent_amount", "total_volume_ml",
    "drug_amount_mg", "diluent_amount_mg", "concentration_mg_per_ml")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q28_annex_merge",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val annex = docs.select(
          col("doc_id").as("row_id"),
          col("doc_id").as("annex_line"), // identity survives the rowId drop
          col("text").as("Drug Description"),
          col("n_chars").as("unit_count"),
          // a previous tagging run: marker + stale tag columns that the
          // merge must drop before joining the fresh tag
          lit("no_match").as("match_reason"),
          lit("STALE").as("dose"),
          lit("STALE").as("matched_reference_text"))
        val tagged = docs.filter(col("doc_id") % 3 =!= 0).select(
          Seq(
            col("doc_id").as("id"),
            upper(substring(col("text"), 1, 12)).as("generic_name"),
            concat(lit("REF:"), upper(substring(col("text"), 1, 8)))
              .as("reference_text"),
            (col("n_chars") % 100).cast("double").as("match_score"),
            lit("matched").as("match_reason"),
            col("lang").as("sources"),
            concat((col("n_chars") % 500).cast("string"), lit(" MG")).as("dose"),
            lit("TABLET").as("form"),
            lit("ORAL").as("route"),
            concat(lit("N02BE"),
              lpad((col("doc_id") % 10).cast("string"), 2, "0")).as("atc_code"),
            concat(lit("DB"), col("doc_id").cast("string")).as("drugbank_id")) ++
            nullStr.map(c => lit(null).cast("string").as(c)) ++
            nullDbl.map(c => lit(null).cast("double").as(c)): _*)
        AnnexFTagging.mergeTagged(annex, tagged).orderBy("annex_line")
      },
      Some(s"""WITH tagged AS (
             |  SELECT doc_id AS id,
             |    upper(substr(text, 1, 12)) AS generic_name,
             |    'REF:' || upper(substr(text, 1, 8)) AS reference_text,
             |    CAST(n_chars % 100 AS DOUBLE) AS match_score,
             |    'matched' AS match_reason,
             |    lang AS sources,
             |    CAST(n_chars % 500 AS VARCHAR) || ' MG' AS dose,
             |    'TABLET' AS form, 'ORAL' AS route,
             |    'N02BE' || lpad(CAST(doc_id % 10 AS VARCHAR), 2, '0') AS atc_code,
             |    'DB' || CAST(doc_id AS VARCHAR) AS drugbank_id
             |  FROM documents WHERE doc_id % 3 <> 0)
             |SELECT d.doc_id AS annex_line,
             |  d.text AS "Drug Description",
             |  d.n_chars AS unit_count,
             |  t.atc_code, t.drugbank_id,
             |  t.generic_name AS matched_generic_name,
             |  t.reference_text AS matched_reference_text,
             |  t.match_score, t.match_reason,
             |  t.sources AS matched_source,
             |  t.dose, t.form, t.route,
             |  ${nullStr.map(c => s"CAST(NULL AS VARCHAR) AS $c").mkString(", ")},
             |  ${nullDbl.map(c => s"CAST(NULL AS DOUBLE) AS $c").mkString(", ")}
             |FROM documents d LEFT JOIN tagged t ON d.doc_id = t.id
             |ORDER BY annex_line""".stripMargin))
  )
}
