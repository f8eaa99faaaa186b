package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.tagger.{LookupWaterfall, ScoredTagger}

/** Oracle-checked demonstration of the C1 lookup waterfall over the
  * synthetic `documents` table, running through the SAME
  * [[graft.tagger.LookupWaterfall]] code the drug tagger uses.
  *
  * Setup: the probe is each document's first word; the catalog is the
  * corpus vocabulary minus a fixed holdout (the s-words + "vector") so
  * every leg demonstrably fires at sf0.01: held-out probes miss exact,
  * "vector" recovers via first-letter prefix ("value"), "slow"/"sort"/
  * "spark" via fuzzy ("row"/"part", distance 2), and "scan"/"small"/
  * "stream" stay no_match.
  */
object Waterfall {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q23_lookup_waterfall",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        val probes = toks.select(col("doc_id").as("id"), lit(1).as("probe_pos"),
          element_at(col("t"), 1).as("probe"))
        val catalog = toks
          .select(explode(col("t")).as("key"))
          .groupBy("key").agg(count(lit(1)).as("cnt"))
          .filter(!col("key").isin(
            "vector", "spark", "scan", "slow", "small", "sort", "stream"))
        val best = LookupWaterfall.tag(probes, catalog,
          LookupWaterfall.Config(prefixMode = "char", prefixLen = 1, fuzzyMaxDist = 2))
        probes.select(col("id").as("doc_id"), col("probe"))
          .join(best.select(col("id").as("doc_id"), col("key"), col("leg")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("probe"),
            coalesce(col("key"), lit("")).as("matched_word"),
            LookupWaterfall.reason(col("leg")).as("match_reason"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |probe AS (SELECT doc_id, t[1] AS probe FROM tok),
             |cat AS (SELECT word, count(*) AS cnt FROM
             |          (SELECT unnest(t) AS word FROM tok) w
             |        GROUP BY 1 HAVING word NOT IN
             |          ('vector', 'spark', 'scan', 'slow', 'small', 'sort', 'stream')),
             |exact AS (SELECT p.doc_id, p.probe, c.word, 1 AS leg, 0 AS score
             |          FROM probe p JOIN cat c ON p.probe = c.word),
             |missE AS (SELECT * FROM probe
             |          WHERE doc_id NOT IN (SELECT doc_id FROM exact)),
             |pref AS (SELECT m.doc_id, m.probe, c.word, 2 AS leg, len(c.word) AS score
             |         FROM missE m JOIN cat c
             |           ON c.word LIKE substr(m.probe, 1, 1) || '%' AND c.word <> m.probe),
             |missP AS (SELECT * FROM missE
             |          WHERE doc_id NOT IN (SELECT doc_id FROM pref)),
             |fuzz AS (SELECT m.doc_id, m.probe, c.word, 3 AS leg,
             |           levenshtein(m.probe, c.word) AS score
             |         FROM missP m JOIN cat c
             |           ON levenshtein(m.probe, c.word) <= 2 AND c.word <> m.probe),
             |all_legs AS (SELECT * FROM exact UNION ALL SELECT * FROM pref
             |             UNION ALL SELECT * FROM fuzz),
             |best AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |           ORDER BY leg, score, word) AS rn FROM all_legs)
             |SELECT p.doc_id AS doc_id, p.probe AS probe,
             |  coalesce(b.word, '') AS matched_word,
             |  CASE b.leg WHEN 1 THEN 'exact' WHEN 2 THEN 'prefix'
             |    WHEN 3 THEN 'fuzzy' ELSE 'no_match' END AS match_reason
             |FROM probe p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
             |  ON p.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ---- full C1 composition (candidate gathering + shape classification
    //      + rule-based selection) through ScoredTagger. The selection
    //      logic is not SQL-expressible, so this records the driver's
    //      rows-only check; exact selection parity is covered by the
    //      ScalaTest goldens against the reference scoring module.
    QueryDef(
      "q26_scored_tagger",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val texts = docs.select(col("doc_id").as("id"), col("text"))
        val catalog = docs
          .select(explode(split(col("text"), " ")).as("key"))
          .groupBy("key").agg(count(lit(1)).as("cnt"))
          .filter(!col("key").isin("vector", "spark", "the"))
          .select(col("key"), upper(col("key")).as("generic_name"),
            concat(lit("ATC"), upper(col("key"))).as("atc_code"),
            concat(lit("DB"), col("key")).as("drugbank_id"),
            lit("TABLET").as("form"), lit("ORAL").as("route"),
            lit("corpus").as("source"),
            upper(col("key")).as("reference_text"))
        ScoredTagger.tagTexts(s, texts, catalog)
          .select(col("id").as("doc_id"), col("atc_code"), col("match_reason"))
          .orderBy("doc_id")
      },
      None)
  )
}
