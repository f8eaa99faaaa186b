package graft.bridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Part-4 bridge (SURVEY §2.9 C2): strict generic+dose+form+route matching
  * of items against a candidate catalog, with failure-reason attribution.
  *
  * The reference walks candidates per row in Python
  * (`runners.py:1147-1390`); here the same semantics are one explode-join
  * plus ONE conditional aggregation (SURVEY §7.4 risk 3: the failure
  * reason needs per-item counts of which predicate passed across ALL
  * candidates — an aggregation over the joined candidate set, not a
  * filter):
  *
  *   items ⟕ broadcast(catalog) on generic_key        (J7 multimap join)
  *   per-candidate booleans dose_ok/form_ok/route_ok  (J8 theta predicates)
  *   groupBy(item): predicate pass-counts + best perfect candidate
  *   reason cascade identical to `runners.py:1366-1383`:
  *     matched_perfect > no_generic > generic_not_in_annex >
  *     no_dose_in_esoa > dose_mismatch > form_mismatch > route_mismatch >
  *     combined_mismatch
  *
  * Dose keys are structs (kind, v1, v2, unit) mirroring `get_dose_key`
  * (`runners.py:725-790`): kind in {mg, conc, iu}; v2 is the optional
  * volume for conc keys. Zero-tolerance compare (abs < 0.01) with the
  * reference's cross-type equivalences (mg↔conc·vol, iu↔conc[iu]·vol).
  *
  * ROLE SPLIT vs [[Part4Bridge]]: this object is the SQL-expressible
  * demonstration of the C2 execution shape — every predicate is a plain
  * column expression, which is what lets q24 be DuckDB-oracle-checked.
  * Its condensed dose/form semantics deliberately differ from the
  * reference in known ways (conc-vs-conc compares volumes and exact unit
  * strings; mg tolerance 0.01 abs instead of 0.5 abs / 1% rel; no
  * missing-side leniency; no route synonym groups). [[Part4Bridge]] +
  * [[DoseKeys]] + [[RouteForms]] are the REFERENCE-PARITY path
  * (golden-tested against `runners.py`) — production flows must use
  * those; new code should not grow this matcher's semantics.
  */
object BridgeMatcher {

  /** Expected item columns: id, generic_key (nullable), dose struct cols
    * (dose_kind/dose_v1/dose_v2/dose_unit, dose_kind null = no dose),
    * form (nullable), routes (array<string>, nullable).
    * Catalog: generic_key, drug_code, same dose/form/routes columns
    * (prefixed cand_).
    */
  def matchDrugCodes(items: DataFrame, catalog: DataFrame,
      formGroups: Map[String, String] = Map.empty): DataFrame = {

    val cat = broadcast(catalog.select(
      col("generic_key"),
      col("drug_code"),
      col("dose_kind").as("cand_dose_kind"),
      col("dose_v1").as("cand_dose_v1"),
      col("dose_v2").as("cand_dose_v2"),
      col("dose_unit").as("cand_dose_unit"),
      col("form").as("cand_form"),
      col("routes").as("cand_routes")))

    val joined = items.join(cat, Seq("generic_key"), "left")

    val doseOk = dosesMatch(
      col("dose_kind"), col("dose_v1"), col("dose_v2"), col("dose_unit"),
      col("cand_dose_kind"), col("cand_dose_v1"), col("cand_dose_v2"),
      col("cand_dose_unit"))
    val formOk = formsCompatible(col("form"), col("cand_form"), formGroups)
    val routeOk = coalesce(
      arrays_overlap(col("routes"), col("cand_routes")), lit(false))
    val perfect = doseOk && formOk && routeOk

    val agg = joined
      .withColumn("dose_ok", doseOk)
      .withColumn("form_ok", formOk)
      .withColumn("route_ok", routeOk)
      .withColumn("perfect", perfect)
      .groupBy("id")
      .agg(
        count(col("drug_code")).as("n_cand"),
        count(when(col("dose_ok"), 1)).as("n_dose_ok"),
        count(when(col("form_ok"), 1)).as("n_form_ok"),
        count(when(col("route_ok"), 1)).as("n_route_ok"),
        // D3 tie-break: prefer exact form, then lexicographic drug_code —
        // min over an ordered struct is a deterministic arg-min
        min(when(col("perfect"),
          struct(
            when(col("cand_form") === col("form"), 0).otherwise(1).as("form_rank"),
            col("drug_code").as("drug_code")))).as("best"))

    items.join(agg, Seq("id"), "left")
      .withColumn("drug_code", col("best.drug_code"))
      .withColumn("drug_code_match_reason",
        when(col("generic_key").isNull, "no_generic")
          .when(col("n_cand") === 0, "generic_not_in_annex")
          .when(col("dose_kind").isNull, "no_perfect_match:no_dose_in_esoa")
          .when(col("best").isNotNull, "matched_perfect")
          .when(col("n_dose_ok") === 0, "no_perfect_match:dose_mismatch")
          .when(col("n_form_ok") === 0, "no_perfect_match:form_mismatch")
          .when(col("n_route_ok") === 0, "no_perfect_match:route_mismatch")
          .otherwise("no_perfect_match:combined_mismatch"))
      .drop("best")
  }

  private def near(a: Column, b: Column): Column = abs(a - b) < 0.01

  /** Zero-tolerance dose-key compare with cross-type equivalence
    * (`runners.py:792-957`, condensed to the mg/conc/iu kinds; the iv
    * diluent-aware kind lands with the constants port).
    */
  def dosesMatch(aKind: Column, aV1: Column, aV2: Column, aUnit: Column,
      bKind: Column, bV1: Column, bV2: Column, bUnit: Column): Column = {
    val bothPresent = aKind.isNotNull && bKind.isNotNull
    val sameKind = aKind === bKind &&
      near(aV1, bV1) &&
      (aV2.isNull || bV2.isNull || near(aV2, bV2)) &&
      (aUnit.isNull || bUnit.isNull || aUnit === bUnit)
    // mg total vs conc(mg/mL)*volume
    def mgVsConc(mgV: Column, cKind: Column, cV1: Column, cV2: Column,
        cUnit: Column): Column =
      cKind === "conc" && (cUnit.isNull || cUnit === "mg") &&
        cV2.isNotNull && near(cV1 * cV2, mgV)
    // iu total vs conc with iu unit
    def iuVsConc(iuV: Column, cKind: Column, cV1: Column, cV2: Column,
        cUnit: Column): Column =
      cKind === "conc" && cUnit === "iu" &&
        ((cV2.isNotNull && cV2 > 0 && near(cV1 * cV2, iuV)) || near(cV1, iuV))
    bothPresent && (
      sameKind ||
        (aKind === "mg" && mgVsConc(aV1, bKind, bV1, bV2, bUnit)) ||
        (bKind === "mg" && mgVsConc(bV1, aKind, aV1, aV2, aUnit)) ||
        (aKind === "iu" && iuVsConc(aV1, bKind, bV1, bV2, bUnit)) ||
        (bKind === "iu" && iuVsConc(bV1, aKind, aV1, aV2, aUnit)))
  }

  /** Form compatibility: exact match, or same caller-provided equivalence
    * group (`runners.py:1195-1296` condensed; null form on either side is
    * incompatible, as in the reference's normalize_for_match guard).
    */
  def formsCompatible(a: Column, b: Column,
      groups: Map[String, String]): Column = {
    val base = a.isNotNull && b.isNotNull && (a === b)
    if (groups.isEmpty) coalesce(base, lit(false))
    else {
      val m = typedLit(groups)
      val ga = coalesce(element_at(m, a), a)
      val gb = coalesce(element_at(m, b), b)
      coalesce(a.isNotNull && b.isNotNull && (ga === gb), lit(false))
    }
  }
}
