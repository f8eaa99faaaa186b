package graft.operators

import org.apache.spark.sql.functions._

import graft.bridge.BridgeMatcher
import graft.core.{QueryDef, Tables}

/** Oracle-checked demonstration of the C2 strict bridge matcher over the
  * synthetic `part` table, through the SAME [[graft.bridge.BridgeMatcher]]
  * code path the drug pipeline uses.
  *
  * Construction: parts with partkey%3==0 form the candidate catalog
  * (multimap on p_brand), parts with partkey%3==1 are the items; dose is
  * p_size*10 mg, form/route derive from p_type words. Guards inject the
  * no_generic (p_size>45) and no_dose (p_size<3) branches so the full
  * reason cascade is exercised and hash-checked.
  */
object Bridge {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q24_bridge_match",
      (s, dir) => {
        val base = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"),
            split(col("p_type"), " ").as("tw"))
        val items = base.filter(col("p_partkey") % 3 === 1)
          .select(
            col("p_partkey").as("id"),
            when(col("p_size") > 45, lit(null)).otherwise(col("p_brand"))
              .as("generic_key"),
            when(col("p_size") < 3, lit(null)).otherwise(lit("mg"))
              .as("dose_kind"),
            when(col("p_size") < 3, lit(null))
              .otherwise((col("p_size") * 10).cast("double")).as("dose_v1"),
            lit(null).cast("double").as("dose_v2"),
            when(col("p_size") < 3, lit(null)).otherwise(lit("mg"))
              .as("dose_unit"),
            element_at(col("tw"), -1).as("form"),
            array(element_at(col("tw"), 1)).as("routes"))
        val catalog = base.filter(col("p_partkey") % 3 === 0)
          .select(
            col("p_brand").as("generic_key"),
            concat(lit("P"), col("p_partkey")).as("drug_code"),
            lit("mg").as("dose_kind"),
            (col("p_size") * 10).cast("double").as("dose_v1"),
            lit(null).cast("double").as("dose_v2"),
            lit("mg").as("dose_unit"),
            element_at(col("tw"), -1).as("form"),
            array(element_at(col("tw"), 1)).as("routes"))
        BridgeMatcher.matchDrugCodes(items, catalog)
          .select("id", "drug_code", "drug_code_match_reason")
          .orderBy("id")
      },
      Some("""WITH base AS (SELECT p_partkey, p_brand, p_size,
             |         string_split(p_type, ' ') AS tw FROM part),
             |items AS (SELECT p_partkey AS id,
             |    CASE WHEN p_size > 45 THEN NULL ELSE p_brand END AS generic_key,
             |    CASE WHEN p_size < 3 THEN NULL ELSE CAST(p_size*10 AS DOUBLE) END AS dose_v1,
             |    CASE WHEN p_size < 3 THEN NULL ELSE 'mg' END AS dose_kind,
             |    tw[len(tw)] AS form, tw[1] AS route
             |  FROM base WHERE p_partkey % 3 = 1),
             |cat AS (SELECT p_brand AS generic_key, 'P' || p_partkey AS drug_code,
             |    CAST(p_size*10 AS DOUBLE) AS cand_v1,
             |    tw[len(tw)] AS cand_form, tw[1] AS cand_route
             |  FROM base WHERE p_partkey % 3 = 0),
             |flags AS (SELECT i.id, i.generic_key, i.dose_kind, c.drug_code,
             |    (i.dose_v1 IS NOT NULL AND c.cand_v1 IS NOT NULL
             |      AND abs(c.cand_v1 - i.dose_v1) < 0.01) AS dose_ok,
             |    (c.cand_form = i.form) AS form_ok,
             |    (c.cand_route = i.route) AS route_ok
             |  FROM items i LEFT JOIN cat c ON i.generic_key = c.generic_key),
             |agg AS (SELECT id, any_value(generic_key) AS generic_key,
             |    any_value(dose_kind) AS dose_kind,
             |    count(drug_code) AS n_cand,
             |    count(CASE WHEN dose_ok THEN 1 END) AS n_dose,
             |    count(CASE WHEN form_ok THEN 1 END) AS n_form,
             |    count(CASE WHEN route_ok THEN 1 END) AS n_route,
             |    min(CASE WHEN dose_ok AND form_ok AND route_ok
             |        THEN drug_code END) AS best
             |  FROM flags GROUP BY id)
             |SELECT id, best AS drug_code,
             |  CASE WHEN generic_key IS NULL THEN 'no_generic'
             |       WHEN n_cand = 0 THEN 'generic_not_in_annex'
             |       WHEN dose_kind IS NULL THEN 'no_perfect_match:no_dose_in_esoa'
             |       WHEN best IS NOT NULL THEN 'matched_perfect'
             |       WHEN n_dose = 0 THEN 'no_perfect_match:dose_mismatch'
             |       WHEN n_form = 0 THEN 'no_perfect_match:form_mismatch'
             |       WHEN n_route = 0 THEN 'no_perfect_match:route_mismatch'
             |       ELSE 'no_perfect_match:combined_mismatch'
             |  END AS drug_code_match_reason
             |FROM agg ORDER BY id""".stripMargin))
  )
}
