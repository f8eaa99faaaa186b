package graft.refbuild

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unified reference-table builders (SURVEY §2 A4–A6, U1–U2, D2; port of
  * `build_unified_reference.py`): layer DrugBank lean exports with
  * WHO/PNF/FDA/canonical sources into the unified_* lookup tables the
  * tagger consumes.
  *
  * Determinism: the reference's add-only-if-absent layering is pandas
  * concat + isin; here each layer is a left_anti join and every keep-first
  * dedup is a row_number window over an explicit source-precedence column
  * (the FDA-before-DrugBank brand rule, `build_unified_reference.py:
  * 425-459`, depends on it — SURVEY §7.4 risk 4).
  */
object UnifiedReference {

  private def nameKey(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9 ]", ""))

  private def cleanName(c: Column): Column = upper(trim(c))

  /** add-only-if-absent layering on generic_name (U2). */
  private def addLayer(base: DataFrame, layer: DataFrame): DataFrame =
    base.unionByName(
      layer.join(base.select("generic_name"), Seq("generic_name"), "left_anti"))

  /** unified_generics (`:160-288`): drugbank ⊕ who ⊕ pnf ⊕ canonical ⊕
    * pnf_raw layers; canonicals WITH a DrugBank id overwrite the id+source
    * of already-present names.
    */
  def buildGenerics(spark: SparkSession, drugbankGenerics: DataFrame,
      whoAtc: DataFrame, pnfPrepared: Option[DataFrame]): DataFrame = {
    val db = drugbankGenerics
      .filter(col("drugbank_id").isNotNull &&
        col("generic_name").isNotNull && col("generic_name") =!= "")
      .select(col("drugbank_id"), cleanName(col("generic_name")).as("generic_name"),
        col("name_key"), lit("drugbank").as("source"))
      .distinct()
    val who = whoAtc
      .filter(col("atc_name").isNotNull && col("atc_name") =!= "")
      .select(lit(null).cast("string").as("drugbank_id"),
        cleanName(col("atc_name")).as("generic_name"),
        nameKey(col("atc_name")).as("name_key"), lit("who").as("source"))
      .distinct()
    var out = addLayer(db, who)
    pnfPrepared.foreach { pnf =>
      val p = pnf.filter(col("generic_normalized").isNotNull &&
          col("generic_normalized") =!= "")
        .select(lit(null).cast("string").as("drugbank_id"),
          cleanName(col("generic_normalized")).as("generic_name"),
          nameKey(col("generic_normalized")).as("name_key"),
          lit("pnf").as("source"))
        .distinct()
      out = addLayer(out, p)
    }
    out = dedupFirst(out, Seq("generic_name"),
      Seq(sourcePrecedence(col("source")), col("drugbank_id")))

    // canonical layer: entries with a DrugBank id overwrite in place
    val canonical = spark.read.option("header", "true")
      .csv(getClass.getResource("/graft/canonical_generics.csv").toString)
      .select(cleanName(col("generic_name")).as("generic_name"),
        when(col("drugbank_id") === "", null).otherwise(col("drugbank_id"))
          .as("canon_db_id"),
        nameKey(col("generic_name")).as("canon_name_key"))
    val withDb = canonical.filter(col("canon_db_id").isNotNull)
    val noDb = canonical.filter(col("canon_db_id").isNull)
    out = out.join(withDb.select("generic_name", "canon_db_id"),
        Seq("generic_name"), "left")
      .withColumn("drugbank_id",
        coalesce(col("canon_db_id"), col("drugbank_id")))
      .withColumn("source",
        when(col("canon_db_id").isNotNull, "canonical").otherwise(col("source")))
      .drop("canon_db_id")
    val newWithDb = withDb
      .join(out.select("generic_name"), Seq("generic_name"), "left_anti")
      .select(col("canon_db_id").as("drugbank_id"), col("generic_name"),
        col("canon_name_key").as("name_key"), lit("canonical").as("source"))
    val newNoDb = noDb
      .join(out.select("generic_name"), Seq("generic_name"), "left_anti")
      .select(lit(null).cast("string").as("drugbank_id"), col("generic_name"),
        col("canon_name_key").as("name_key"), lit("canonical").as("source"))
    out = out.unionByName(newWithDb).unionByName(newNoDb)
    pnfPrepared.foreach { pnf =>
      val raw = pnf.filter(col("raw_molecule").isNotNull &&
          col("raw_molecule") =!= "")
        .select(lit(null).cast("string").as("drugbank_id"),
          cleanName(col("raw_molecule")).as("generic_name"),
          nameKey(col("raw_molecule")).as("name_key"),
          lit("pnf_raw").as("source"))
        .distinct()
      out = addLayer(out, raw)
    }
    dedupFirst(out, Seq("generic_name"),
      Seq(sourcePrecedence(col("source")), col("drugbank_id")))
  }

  private def sourcePrecedence(source: Column): Column =
    when(source === "drugbank", 0).when(source === "who", 1)
      .when(source === "pnf", 2).when(source === "canonical", 3)
      .otherwise(4)

  /** keep-first with explicit precedence (D2). */
  def dedupFirst(df: DataFrame, keys: Seq[String],
      precedence: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(precedence.map(_.asc_nulls_last): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** unified_synonyms (`:296-306`): pipe-joined distinct synonyms per
    * (drugbank_id, generic_name) — A4. Sorted for determinism (the
    * reference inherits DuckDB STRING_AGG order).
    */
  def buildSynonyms(drugbankSynonyms: DataFrame,
      drugbankGenerics: DataFrame): DataFrame =
    drugbankSynonyms
      .filter(col("drugbank_id").isNotNull &&
        col("synonyms").isNotNull && col("synonyms") =!= "")
      .join(drugbankGenerics.select(col("drugbank_id"),
        cleanName(col("generic_name")).as("generic_name")),
        Seq("drugbank_id"), "left")
      .groupBy("drugbank_id", "generic_name")
      .agg(array_join(array_sort(collect_set(cleanName(col("synonyms")))), "|")
        .as("synonyms"))

  /** unified_atc (`:314-364`): DrugBank atc layered with WHO names. */
  def buildAtcMap(drugbankAtc: DataFrame, drugbankGenerics: DataFrame,
      whoAtc: DataFrame): DataFrame = {
    val db = drugbankAtc
      .filter(col("drugbank_id").isNotNull &&
        col("atc_code").isNotNull && col("atc_code") =!= "")
      .join(drugbankGenerics.select(col("drugbank_id"),
        cleanName(col("generic_name")).as("generic_name")),
        Seq("drugbank_id"), "left")
      .select(col("drugbank_id"), col("generic_name"),
        trim(col("atc_code")).as("atc_code"))
      .distinct()
    val who = whoAtc
      .filter(col("atc_name").isNotNull && col("atc_name") =!= "" &&
        col("atc_code").isNotNull && col("atc_code") =!= "")
      .select(lit(null).cast("string").as("drugbank_id"),
        cleanName(col("atc_name")).as("generic_name"),
        trim(col("atc_code")).as("atc_code"))
      .distinct()
    db.unionByName(
      who.join(db.select("generic_name", "atc_code").distinct(),
        Seq("generic_name", "atc_code"), "left_anti"))
  }

  /** unified_brands (`:425-459`): FDA rows win over DrugBank on the same
    * brand_name (keep-first with source precedence).
    */
  def buildBrands(fdaBrands: DataFrame, drugbankBrands: DataFrame,
      drugbankGenerics: DataFrame): DataFrame = {
    val fda = fdaBrands
      .filter(col("brand_name").isNotNull && col("brand_name") =!= "")
      .select(cleanName(col("brand_name")).as("brand_name"),
        cleanName(col("generic_name")).as("generic_name"),
        lit("").as("drugbank_id"), lit("fda").as("source"))
      .distinct()
    val db = drugbankBrands
      .filter(col("brand_name").isNotNull && col("brand_name") =!= "")
      .join(drugbankGenerics.select(col("drugbank_id"),
        cleanName(col("generic_name")).as("generic_name")),
        Seq("drugbank_id"), "left")
      .select(cleanName(col("brand_name")).as("brand_name"),
        coalesce(col("generic_name"), lit("")).as("generic_name"),
        coalesce(col("drugbank_id"), lit("")).as("drugbank_id"),
        lit("drugbank").as("source"))
      .distinct()
    dedupFirst(fda.unionByName(db), Seq("brand_name"),
      Seq(when(col("source") === "fda", 0).otherwise(1),
        col("generic_name"), col("drugbank_id")))
  }

  /** unified_mixtures (`:486-500`): keep-first per sorted component_key. */
  def buildMixtures(drugbankMixtures: DataFrame): DataFrame =
    dedupFirst(
      drugbankMixtures
        .filter(col("drugbank_id").isNotNull &&
          col("component_generics").isNotNull &&
          col("component_generics") =!= "")
        .select(col("drugbank_id"),
          cleanName(col("mixture_name")).as("mixture_name"),
          col("component_generics"), col("component_keys"),
          col("component_key_sorted").as("component_key"),
          col("component_count"))
        .distinct(),
      Seq("component_key"),
      Seq(col("drugbank_id"), col("mixture_name")))

  /** engineered component key for mixture rows built from scratch (J11):
    * sorted pipe-joined normalized components.
    */
  def componentKey(components: Column): Column =
    array_join(array_sort(components), "|")

  /** J12 mixture-name fallback rows (`tagger.py:782-804`): mixtures keyed
    * by UPPER(mixture_name), so a synonym-applied probe like CO-AMOXICLAV
    * -> "AMOXICILLIN AND CLAVULANATE POTASSIUM" resolves by name when the
    * generics catalog missed. Marked `fallback_only`: [[graft.tagger
    * .ScoredTagger.tagCandidates]] admits these candidates only for ids
    * with NO regular candidate, the reference's "unique_matches empty"
    * gate. ATC stays null (mixtures often have none); such candidates
    * survive selection through their drugbank_id (`tagger.py:857-868`).
    *
    * Union the result with the generics-keyed catalog before tagging.
    */
  /** One-call tagger catalog — the set of lookup keys `tagger.load()`
    * exposes (`tagger.py:145-360`): unified generics keyed by lowercase
    * name with their pipe-aggregated ATC payloads, mixtures keyed by
    * component key (J11), and mixtures keyed by name as fallback-only
    * rows (J12). Feed the result straight to
    * [[graft.tagger.ScoredTagger.tagTexts]].
    *
    * @param generics [[buildGenerics]] output
    * @param atcMap   [[buildAtcMap]] output
    * @param mixtures [[buildMixtures]] output (None = no mixture legs)
    */
  def buildTaggerCatalog(generics: DataFrame, atcMap: DataFrame,
      mixtures: Option[DataFrame] = None): DataFrame = {
    // one catalog row per generic; multiple ATC codes pipe-join so the
    // tagger's G2 explode sees them in one payload
    val atcAgg = atcMap
      .filter(col("generic_name").isNotNull)
      .groupBy("generic_name")
      .agg(array_join(array_sort(collect_set(col("atc_code"))), "|").as("atc_code"))
    val genRows = generics
      .join(atcAgg, Seq("generic_name"), "left")
      .select(
        lower(col("generic_name")).as("key"),
        col("generic_name"),
        col("atc_code"),
        col("drugbank_id"),
        lit(null: String).as("form"), lit(null: String).as("route"),
        col("source"),
        col("generic_name").as("reference_text"),
        lit(false).as("fallback_only"),
        lit(false).as("exact_only"))
    mixtures match {
      case None => genRows
      case Some(mx) =>
        // Component-key rows mirror `_lookup_mixture`'s return dict
        // (`tagger.py:345-356`): the DISPLAY name is the sorted
        // components joined " + " (equal to the upper component key — the
        // probe only hits when the keys are equal), reference_text is the
        // RAW component_generics value, and the source marker is
        // "drugbank_mixture". fallback_only: the reference consults the
        // mixture table only when `unique_matches` is empty
        // (`tagger.py:806-824`), the same gate as the J12 name rows.
        val componentRows = mx
          .filter(col("component_key").isNotNull && col("component_key") =!= "")
          .select(
            lower(col("component_key")).as("key"),
            regexp_replace(upper(col("component_key")), "\\|", " + ")
              .as("generic_name"),
            lit(null: String).as("atc_code"),
            col("drugbank_id"),
            lit(null: String).as("form"), lit(null: String).as("route"),
            lit("drugbank_mixture").as("source"),
            col("component_generics").as("reference_text"),
            lit(true).as("fallback_only"),
            lit(true).as("exact_only"))
          .dropDuplicates("key")
        genRows.unionByName(componentRows).unionByName(mixtureNameRows(mx))
    }
  }

  /** Table-driven synonym entries for the tagger's dict
    * (`tagger.py:216-229`): each pipe-separated synonym of a
    * unified_synonyms row maps UPPER(synonym) -> UPPER(generic_name),
    * skipping self-mappings. Merge the result over
    * `Constants.taggerSynonyms` via `tagTexts(synonyms = ...)`.
    * Driver-side collect of a dimension table, like [[buildBrandMap]].
    */
  def buildSynonymMap(synonyms: DataFrame): Map[String, String] = {
    val rows = synonyms
      .filter(col("generic_name").isNotNull &&
        col("synonyms").isNotNull && col("synonyms") =!= "")
      .select(upper(col("generic_name")).as("g"), col("synonyms"))
      .collect()
    val map = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (r <- rows) {
      val g = r.getAs[String]("g")
      for (s0 <- r.getAs[String]("synonyms").split("\\|")) {
        val s = s0.trim.toUpperCase
        if (s.nonEmpty && s != g) map(s) = g
      }
    }
    map.toMap
  }

  /** The tagger's brand -> generic swap map (J10 build side,
    * `tagger.py:232-265`): brand rows grouped and ranked by frequency so
    * more common associations win, with the FDA brand/generic SWAP rule —
    * a `brand_name` that is itself a known generic (or a spelling-synonym
    * key) is treated as the generic and its `generic_name` as the brand.
    * Frequency ties are pinned by (brand, generic) — the reference
    * inherits DuckDB's unstable ORDER BY cnt DESC tail.
    *
    * Driver-side collect of a DIMENSION table (the reference holds the
    * same dict in tagger memory); feed the result to
    * [[graft.tagger.ScoredTagger.tagTexts]]'s `brandMap`.
    */
  def buildBrandMap(brands: DataFrame, generics: DataFrame): Map[String, String] = {
    val allGenerics = generics.select(upper(col("generic_name")).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val synonymGenerics =
      graft.functions.Constants.spellingSynonyms.keySet.map(_.toUpperCase)
    // group RAW-cased rows like the reference's SQL (`tagger.py:244-249`)
    // — case variants of a brand count separately and only uppercase at
    // insert time; frequency ties pinned by (brand, generic)
    val ranked = brands
      .filter(col("brand_name").isNotNull && col("generic_name").isNotNull)
      .groupBy(col("brand_name").as("b0"), col("generic_name").as("g0"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("b0"), col("g0"))
      .collect()
    val map = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (r <- ranked) {
      val (b, g) =
        (r.getAs[String]("b0").toUpperCase, r.getAs[String]("g0").toUpperCase)
      if (b.nonEmpty && g.nonEmpty) {
        if (allGenerics.contains(b) || synonymGenerics.contains(b)) {
          if (!allGenerics.contains(g) && !map.contains(g)) map(g) = b
        } else if (!map.contains(b)) map(b) = g
      }
    }
    map.toMap
  }

  def mixtureNameRows(mixtures: DataFrame): DataFrame =
    mixtures
      .filter(col("mixture_name").isNotNull && col("mixture_name") =!= "")
      .select(
        lower(col("mixture_name")).as("key"),
        cleanName(col("mixture_name")).as("generic_name"),
        lit(null: String).as("atc_code"),
        col("drugbank_id"),
        lit(null: String).as("form"),
        lit(null: String).as("route"),
        lit("mixtures").as("source"),
        cleanName(col("mixture_name")).as("reference_text"),
        lit(true).as("fallback_only"),
        lit(true).as("exact_only"))
      .dropDuplicates("key")
}
