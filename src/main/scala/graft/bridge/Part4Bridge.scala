package graft.bridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-fidelity Part-4 bridge (C2): [[BridgeMatcher]]'s explode-join +
  * conditional-aggregation attribution, with the COMPLETE dose semantics
  * of [[DoseKeys]] (all five key kinds incl. IV diluent classes and
  * cross-type equivalence), the reference's route/form compatibility
  * closures from [[RouteForms]] (missing side = compatible, route
  * synonym groups), and dose keys built by [[DoseKeys.getDoseKey]] from
  * structured columns + dose strings + description context.
  *
  * Dose keys travel as a struct column (kind, v1, v2, s):
  *   mg/iu/combo: v1 = value; conc: v1 = strength, v2 = volume, s = unit;
  *   iv: v1 = concentration, v2 = volume, s = diluent class.
  */
object Part4Bridge {

  final case class DoseKeyCol(kind: String, v1: Option[Double],
      v2: Option[Double], s: Option[String])

  private def toCol(k: Option[DoseKeys.DoseKey]): Option[DoseKeyCol] = k.map {
    case DoseKeys.MgKey(v) => DoseKeyCol("mg", Some(v), None, None)
    case DoseKeys.IuKey(v) => DoseKeyCol("iu", Some(v), None, None)
    case DoseKeys.ComboKey(v) => DoseKeyCol("combo", Some(v), None, None)
    case DoseKeys.ConcKey(c, v, u) => DoseKeyCol("conc", Some(c), v, Option(u))
    case DoseKeys.IvKey(c, d, v) => DoseKeyCol("iv", c, v, Option(d))
  }

  private def fromCol(r: org.apache.spark.sql.Row): Option[DoseKeys.DoseKey] = {
    if (r == null || r.isNullAt(0)) return None
    def d(i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    def s(i: Int): Option[String] =
      if (r.isNullAt(i)) None else Some(r.getString(i))
    r.getString(0) match {
      case "mg" => d(1).map(DoseKeys.MgKey)
      case "iu" => d(1).map(DoseKeys.IuKey)
      case "combo" => d(1).map(DoseKeys.ComboKey)
      case "conc" => d(1).map(DoseKeys.ConcKey(_, d(2), s(3).orNull))
      case "iv" => Some(DoseKeys.IvKey(d(1), s(3).orNull, d(2)))
      case _ => None
    }
  }

  /** dose-key struct from structured columns + dose string + description
    * (F10 via [[DoseKeys.getDoseKey]], incl. NSS/D5/D10 inference).
    */
  val doseKeyUdf = udf((drugMg: java.lang.Double, conc: java.lang.Double,
      ivType: String, vol: java.lang.Double, doseStr: String,
      description: String, generic: String) =>
    toCol(DoseKeys.getDoseKey(
      Option(drugMg).map(_.doubleValue()),
      Option(conc).map(_.doubleValue()),
      Option(ivType), Option(vol).map(_.doubleValue()),
      Option(doseStr), Option(description).getOrElse(""),
      Option(generic).getOrElse(""))))

  private val dosesMatchUdf =
    udf((a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) =>
      DoseKeys.dosesMatch(fromCol(a), fromCol(b)))

  private val formsCompatUdf = udf((cf: String, ef: String, cr: String,
      er: String) => RouteForms.formsCompatible(cf, ef, cr, er))

  private val routeMatchesUdf = udf((cr: String, er: String) =>
    RouteForms.routeMatches(cr, er))

  /** The eight `*_details` columns the Part-4 tie-break scores, with the
    * reference's weights (`rank_candidate_for_drug_code`,
    * `runners.py:959-1009`). A detail scores when it appears as a
    * substring of the candidate's Annex description; lower total wins.
    */
  val detailWeights: Seq[(String, Int)] = Seq(
    "release_details" -> 10, "type_details" -> 5, "form_details" -> 5,
    "indication_details" -> 5, "salt_details" -> 3, "alias_details" -> 2,
    "iv_diluent_type" -> 5, "iv_diluent_amount" -> 3)

  /** @param items   id, generic_key OR generic_keys (array of probe keys,
    *                [[GenericKeys.esoaProbeKeys]]), dose_key (struct),
    *                form, route (+ the optional `*_details` tie-break
    *                columns — missing ones are treated as null)
    * @param catalog generic_key OR index_keys (array,
    *                [[GenericKeys.annexIndexKeys]]), drug_code, dose_key
    *                (struct), form, route, description
    * @return items + drug_code + drug_code_match_reason (the C2 cascade)
    *
    * With key arrays, a candidate reachable through several keys counts
    * ONCE per (item, drug_code) — the reference dedups candidates by
    * drug_code before the perfect checks (`runners.py:1183-1190`).
    */
  def matchDrugCodes(items: DataFrame, catalog: DataFrame): DataFrame = {
    val catKeyed =
      if (catalog.columns.contains("index_keys"))
        catalog.withColumn("generic_key", explode(col("index_keys")))
      else catalog
    val cat = broadcast(catKeyed.select(
      col("generic_key"), col("drug_code"),
      col("dose_key").as("cand_dose_key"),
      col("form").as("cand_form"), col("route").as("cand_route"),
      col("description").as("cand_description")))

    val items1 =
      if (items.columns.contains("generic_keys")) items
      else items.withColumn("generic_keys",
        when(col("generic_key").isNotNull, array(col("generic_key")))
          .otherwise(typedLit(Seq.empty[String])))
        .drop("generic_key")
    val itemsD = detailWeights.map(_._1).foldLeft(items1) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null: String))
    }.withColumn("generic_key", explode_outer(col("generic_keys")))

    // rank_candidate_for_drug_code as pure Catalyst: -w per detail found
    // in the candidate description (all upper-cased, substring semantics)
    val candDesc = upper(coalesce(col("cand_description"), lit("")))
    val detailsScore = detailWeights.map { case (c, w) =>
      when(col(c).isNotNull && upper(col(c)) =!= "" &&
        candDesc.contains(upper(col(c))), -w).otherwise(0)
    }.reduce(_ + _)

    // candidate dedup by drug_code per item (`runners.py:1183-1190`): the
    // annex may list one drug_code on several rows with DIFFERENT
    // payloads, and the reference keeps the first in index order — a
    // non-distributed concept, so the kept row is pinned by an explicit
    // payload order instead (divergence only when duplicate codes carry
    // conflicting payloads AND annex order differs from the payload
    // order)
    val wdd = Window.partitionBy(col("id"), col("drug_code")).orderBy(
      col("cand_description").asc_nulls_last, col("cand_form").asc_nulls_last,
      col("cand_route").asc_nulls_last, col("generic_key").asc_nulls_last)
    val joined = itemsD.join(cat, Seq("generic_key"), "left")
      .withColumn("_dd", row_number().over(wdd)).filter(col("_dd") === 1)
      .drop("_dd")
      .withColumn("dose_ok",
        coalesce(dosesMatchUdf(col("dose_key"), col("cand_dose_key")), lit(false)))
      .withColumn("form_ok",
        coalesce(formsCompatUdf(col("cand_form"), col("form"),
          col("cand_route"), col("route")), lit(false)))
      .withColumn("route_ok",
        coalesce(routeMatchesUdf(col("cand_route"), col("route")), lit(false)))
      .withColumn("perfect", col("dose_ok") && col("form_ok") && col("route_ok"))

    // The reference sorts perfect matches by details score with a STABLE
    // sort (ties keep Annex row order, `runners.py:1368-1370`); row order
    // is not a distributed concept, so drug_code is the deterministic
    // final key here — divergence only when two perfect matches tie on
    // details score AND the Annex order differs from code order.
    val agg = joined.groupBy("id").agg(
      count(col("drug_code")).as("n_cand"),
      count(when(col("dose_ok"), 1)).as("n_dose_ok"),
      count(when(col("form_ok"), 1)).as("n_form_ok"),
      count(when(col("route_ok"), 1)).as("n_route_ok"),
      min(when(col("perfect"),
        struct(
          detailsScore.as("details_score"),
          col("drug_code").as("drug_code")))).as("best"))

    items1.join(agg, Seq("id"), "left")
      .withColumn("drug_code", col("best.drug_code"))
      .withColumn("drug_code_match_reason",
        when(size(col("generic_keys")) === 0, "no_generic")
          .when(col("n_cand") === 0, "generic_not_in_annex")
          .when(col("dose_key").isNull, "no_perfect_match:no_dose_in_esoa")
          .when(col("best").isNotNull, "matched_perfect")
          .when(col("n_dose_ok") === 0, "no_perfect_match:dose_mismatch")
          .when(col("n_form_ok") === 0, "no_perfect_match:form_mismatch")
          .when(col("n_route_ok") === 0, "no_perfect_match:route_mismatch")
          .otherwise("no_perfect_match:combined_mismatch"))
      .drop("best")
  }
}
