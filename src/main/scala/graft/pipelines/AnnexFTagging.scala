package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources
import graft.tagger.{LookupWaterfall, ScoredTagger}

/** The Part-2 Annex-F runner surface (`runners.py:39-148`,
  * `run_annex_f_tagging`): tag every `Drug Description`, merge the
  * tagger's ~27 result columns back into the annex frame, rename the
  * three `matched_*` columns, and move `matched_reference_text` to sit
  * right after the description column.
  *
  * The reference merges on `row_idx` — POSITIONAL row identity (annex
  * rows keep their own tag even when Drug Codes repeat). A distributed
  * frame has no positional identity, so the caller supplies a unique
  * numeric `rowId` column (trivially present from any source: a surrogate
  * key, a file offset, a monotonic id persisted at ingest); results
  * re-join on it 1:1. Everything downstream of the id is the runner's
  * exact column algebra, golden-checked by AnnexFTaggingSpec against a
  * real `run_annex_f_tagging` run.
  */
object AnnexFTagging {

  /** Tagger result columns in the runner's merge order
    * (`runners.py:81-99` minus row_idx).
    */
  val mergeCols: Seq[String] = Seq(
    "atc_code", "drugbank_id", "generic_name", "reference_text",
    "match_score", "match_reason", "sources",
    "dose", "form", "route",
    "type_details", "release_details", "form_details",
    "salt_details", "brand_details", "indication_details", "alias_details",
    "diluent_details",
    "iv_diluent_type", "iv_diluent_amount",
    "dose_values", "dose_units", "dose_types", "total_volume_ml",
    "drug_amount_mg", "diluent_amount_mg", "concentration_mg_per_ml")

  /** `runners.py:104-108` renames. */
  val renames: Map[String, String] = Map(
    "generic_name" -> "matched_generic_name",
    "reference_text" -> "matched_reference_text",
    "sources" -> "matched_source")

  /** @param annex   the Annex-F frame: `rowId` (unique, castable to
    *                long), `textCol`, and any passthrough columns.
    *                Passthrough columns whose names collide with the
    *                tagger merge columns (or their renamed forms) are
    *                DROPPED first — re-tagging an already-tagged frame is
    *                therefore idempotent (the fresh tag replaces the
    *                stale one) instead of dying on an ambiguous
    *                reference or silently renaming a passthrough column.
    * @param catalog tagger catalog ([[ScoredTagger.tagTexts]] contract)
    * @return the annex columns (minus `rowId`) + renamed tagger columns,
    *         with matched_reference_text placed after `textCol`
    */
  /** Drop a prior run's tag columns before a fresh merge.
    *
    * INTENTIONAL extension over the reference: `run_annex_f_tagging`
    * merges its tag columns blindly, so re-running it over its own
    * output produces duplicate/suffixed columns and crashes on
    * `merged["atc_code"]` (verified by tools/gen_annexf_golden.py's
    * re-tag probe against the real runner) — the reference cannot
    * re-tag a tagged file. Here a prior run's tag columns (the RENAMED
    * names plus the un-renamed remainder of mergeCols, which would
    * collide as join-select ambiguity / double renames) are auto-dropped
    * ONLY when the frame carries an unmistakable marker of a previous
    * tagging run (`match_reason` / `matched_reference_text` exist only
    * as tagger outputs), making re-tag idempotent. A collision WITHOUT
    * the marker means a genuine passthrough column (annexes plausibly
    * carry `dose`, `form`, `route`, `sources`) whose data a silent drop
    * would destroy invisibly — that case fails loudly so the caller
    * renames it.
    */
  private def dropStale(annex0: DataFrame, rowId: String,
      textCol: String): DataFrame = {
    val stale = (mergeCols ++ renames.values)
      .filter(annex0.columns.contains)
      .filterNot(c => c == rowId || c == textCol)
    val priorRunMarker = annex0.columns.contains("match_reason") ||
      annex0.columns.contains("matched_reference_text")
    if (stale.isEmpty) annex0
    else if (priorRunMarker) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"tagAnnex: re-tagging a previously tagged frame; dropping stale " +
          s"tag columns [${stale.mkString(", ")}] before the fresh merge")
      annex0.drop(stale: _*)
    } else throw new IllegalArgumentException(
      s"annex columns [${stale.mkString(", ")}] collide with tagger merge " +
        "columns but the frame shows no prior tagging run (no " +
        "match_reason/matched_reference_text); rename these passthrough " +
        "columns instead of letting the merge silently replace their data")
  }

  /** The runner's merge/rename/reorder algebra in isolation
    * (`runners.py:81-112`): stale-column drop, 1:1 left merge of a tagger
    * result frame (`id` + [[mergeCols]]) back onto the annex rows, the
    * matched_* renames, and matched_reference_text placement. `rowId` is
    * consumed by the merge and dropped, like the runner's row_idx.
    * [[tagAnnex]] composes this with the real tagger; q28 pins it under
    * the driver's DuckDB oracle with a SQL-expressible tagged frame.
    */
  def mergeTagged(annex0: DataFrame, tagged: DataFrame,
      rowId: String = "row_id",
      textCol: String = "Drug Description"): DataFrame = {
    Sources.requireColumns(annex0, "annex frame", rowId, textCol)
    Sources.requireColumns(tagged, "tagged frame", "id" +: mergeCols: _*)
    val annex = dropStale(annex0, rowId, textCol)
    val annexCols = annex.columns.filterNot(_ == rowId).toSeq
    val merged = annex
      .join(tagged, annex(rowId).cast("long") === tagged("id"), "left")
      .select((annexCols ++ mergeCols).map(col): _*)
    val renamed = renames.foldLeft(merged) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    Sources.reorderColumnAfter(renamed, textCol, "matched_reference_text")
  }

  def tagAnnex(spark: SparkSession, annex0: DataFrame, catalog: DataFrame,
      rowId: String = "row_id", textCol: String = "Drug Description",
      cfg: LookupWaterfall.Config = LookupWaterfall.referenceConfig,
      brandMap: Map[String, String] = Map.empty,
      synonyms: Map[String, String] = Map.empty): DataFrame = {
    Sources.requireColumns(annex0, "annex frame", rowId, textCol)
    val annex = dropStale(annex0, rowId, textCol)
    val texts = annex.select(col(rowId).cast("long").as("id"),
      coalesce(col(textCol), lit("")).as("text"))
    val tagged = ScoredTagger.tagTexts(spark, texts, catalog, cfg,
      brandMap, synonyms = synonyms)
      .select((Seq("id") ++ mergeCols).map(col): _*)
    mergeTagged(annex, tagged, rowId, textCol)
  }
}
