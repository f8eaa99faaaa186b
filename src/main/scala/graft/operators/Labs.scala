package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.labs.LabsPipeline

/** Oracle-checked demonstration of the labs pipeline (SURVEY §2.3 J9,
  * §2.2 P4–P6, §2.5 D5) over the synthetic `customer` table, through the
  * SAME [[graft.labs.LabsPipeline]] code path.
  *
  * Construction: customers play eSOA rows (custkey%10==0 gets the wrong
  * category; [1540,1896] exercises the range exclusion); custkey%3==0
  * names form the Labs master, custkey%3<=1 the Diagnostics catalog — so
  * all three match_source outcomes fire and are hash-checked.
  */
object Labs {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q25_labs_match",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val esoa = c.select(
          col("c_custkey").cast("string").as("ITEM_NUMBER"),
          when(col("c_custkey") % 10 === 0, "Drugs")
            .otherwise(LabsPipeline.LabsCode).as("ITEM_REF_CODE"),
          col("c_name").as("DESCRIPTION"),
          lit("customer.parquet").as("SOURCE_FILE"))
        val master = c.filter(col("c_custkey") % 3 === 0).select(
          concat(lit("M"), col("c_custkey")).as("ITEM_NUMBER"),
          lit("1").as("IS_OFFICIAL"),
          upper(col("c_name")).as("DESCRIPTION"))
        val diag = c.filter(col("c_custkey") % 3 <= 1).select(
          concat(lit("D"), col("c_custkey")).as("code"),
          lower(col("c_name")).as("desc"),
          lit("cat").as("cat"), lit("").as("spec"),
          lit("").as("etc"), lit("").as("misc"))
        val prepared = LabsPipeline.prepare(Seq(esoa))
        LabsPipeline.matchRecords(prepared, master, diag)
          .select("ITEM_NUMBER", "DESCRIPTION", "normalized_description",
            "match_source", "standard_description", "lab_item_number",
            "diagnostics_code")
          .orderBy("ITEM_NUMBER")
      },
      Some("""WITH esoa AS (
             |  SELECT CAST(c_custkey AS VARCHAR) AS item_number_raw, c_custkey, c_name
             |  FROM customer
             |  WHERE c_custkey % 10 <> 0
             |    AND NOT (c_custkey BETWEEN 1540 AND 1896)),
             |norm AS (
             |  SELECT item_number_raw AS ITEM_NUMBER, c_name AS DESCRIPTION,
             |    trim(regexp_replace(lower(c_name), '[^a-z0-9]+', ' ', 'g'))
             |      AS normalized_description,
             |    c_custkey
             |  FROM esoa),
             |master AS (
             |  SELECT 'M' || c_custkey AS lab_item_number,
             |    upper(c_name) AS lab_description,
             |    trim(regexp_replace(lower(upper(c_name)), '[^a-z0-9]+', ' ', 'g'))
             |      AS norm_key
             |  FROM customer WHERE c_custkey % 3 = 0),
             |diag AS (
             |  SELECT 'D' || c_custkey AS diagnostics_code,
             |    lower(c_name) AS diag_desc,
             |    trim(regexp_replace(lower(c_name), '[^a-z0-9]+', ' ', 'g'))
             |      AS norm_key
             |  FROM customer WHERE c_custkey % 3 <= 1)
             |SELECT n.ITEM_NUMBER, n.DESCRIPTION, n.normalized_description,
             |  CASE WHEN m.lab_description IS NOT NULL THEN 'Labs'
             |       WHEN d.diag_desc IS NOT NULL THEN 'Diagnostics'
             |       ELSE 'Unmatched' END AS match_source,
             |  coalesce(m.lab_description, d.diag_desc, n.DESCRIPTION)
             |    AS standard_description,
             |  m.lab_item_number,
             |  CASE WHEN m.lab_description IS NOT NULL THEN NULL
             |       ELSE d.diagnostics_code END AS diagnostics_code
             |FROM norm n
             |LEFT JOIN master m ON n.normalized_description = m.norm_key
             |LEFT JOIN diag d ON n.normalized_description = d.norm_key
             |ORDER BY ITEM_NUMBER""".stripMargin))
  )
}
