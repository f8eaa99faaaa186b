package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables, Ws}

/** Dataset-curation operators: the table-maintenance and corpus-governance
  * queries a production training-data platform runs BETWEEN pipeline
  * stages — snapshot reconciliation (what changed since the last build),
  * filter-threshold calibration (what a quality cut would actually keep),
  * and the per-source dataset card (the governance summary shipped with
  * every corpus release).
  *
  * All three are beyond the reference's own surface (its pipeline rebuilds
  * outputs whole each run — `run_drugs_all.py` has no notion of an
  * incremental diff) but are first-class needs at 100 TB where "rebuild
  * everything and eyeball it" stops being an option.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Whitespace token count — q30's tokenizer verbatim (explicit ASCII
    * class, not `\s`; see [[graft.core.Ws]] for the U+000B rationale).
    */
  private val nTokens: Column = size(split(trim(col("text")), Ws.Plus))

  val defs: Seq[QueryDef] = Seq(

    /* ---- q81: snapshot diff (CDC between two table versions).
     *
     * Two deterministic snapshots are derived from `orders` (old drops
     * keys ≡3 mod 10; new drops ≡7 mod 10, bumps o_totalprice on ≡0 mod
     * 13 and rewrites o_orderpriority on ≡0 mod 17), then reconciled:
     * added / removed / changed rows with per-column change attribution.
     *
     * Scale shape: ONE full-outer equi-join on the key — at 100 TB both
     * snapshots shuffle once on o_orderkey (or not at all if the tables
     * are bucketed by key, the layout `Sources.writeRangePartitioned`
     * exists for). Column attribution is row-local codegen (null-safe
     * compares + concat_ws), NOT per-column joins; the unchanged majority
     * is dropped before any further processing, so downstream cost is
     * O(churn), not O(table). This is the merge/CDC primitive behind
     * incremental rebuilds: feed `changed ∪ added` to the pipeline,
     * `removed` to retention handling, and skip the untouched 99%.
     */
    QueryDef(
      "q81_snapshot_diff",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val old = o.filter(col("o_orderkey") % 10 =!= 3).select(
          col("o_orderkey").as("old_k"),
          col("o_orderstatus").as("old_status"),
          col("o_totalprice").as("old_price"),
          col("o_orderpriority").as("old_prio"))
        val nw = o.filter(col("o_orderkey") % 10 =!= 7).select(
          col("o_orderkey").as("new_k"),
          col("o_orderstatus").as("new_status"),
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")).as("new_price"),
          when(col("o_orderkey") % 17 === 0, lit("9-SYNTH"))
            .otherwise(col("o_orderpriority")).as("new_prio"))
        // IS DISTINCT FROM = not(<=>): null-safe, so a column going
        // null→value or value→null counts as a change, never as a match
        def differs(a: String, b: String): Column = !(col(a) <=> col(b))
        val anyChange = differs("old_status", "new_status") ||
          differs("old_price", "new_price") || differs("old_prio", "new_prio")
        old.join(nw, col("old_k") === col("new_k"), "full_outer")
          .filter(col("old_k").isNull || col("new_k").isNull || anyChange)
          .select(
            coalesce(col("old_k"), col("new_k")).as("o_orderkey"),
            when(col("old_k").isNull, "added")
              .when(col("new_k").isNull, "removed")
              .otherwise("changed").as("status"),
            concat_ws(",",
              when(col("old_k").isNotNull && col("new_k").isNotNull &&
                differs("old_status", "new_status"), "o_orderstatus"),
              when(col("old_k").isNotNull && col("new_k").isNotNull &&
                differs("old_price", "new_price"), "o_totalprice"),
              when(col("old_k").isNotNull && col("new_k").isNotNull &&
                differs("old_prio", "new_prio"), "o_orderpriority"))
              .as("changed_cols"))
          .orderBy("o_orderkey")
      },
      Some("""WITH old AS (
             |  SELECT o_orderkey k, o_orderstatus st, o_totalprice pr,
             |         o_orderpriority pz
             |  FROM orders WHERE o_orderkey % 10 <> 3),
             |nw AS (
             |  SELECT o_orderkey k, o_orderstatus st,
             |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1
             |         ELSE o_totalprice END pr,
             |    CASE WHEN o_orderkey % 17 = 0 THEN '9-SYNTH'
             |         ELSE o_orderpriority END pz
             |  FROM orders WHERE o_orderkey % 10 <> 7)
             |SELECT coalesce(old.k, nw.k) AS o_orderkey,
             |  CASE WHEN old.k IS NULL THEN 'added'
             |       WHEN nw.k IS NULL THEN 'removed'
             |       ELSE 'changed' END AS status,
             |  concat_ws(',',
             |    CASE WHEN old.k IS NOT NULL AND nw.k IS NOT NULL
             |         AND old.st IS DISTINCT FROM nw.st
             |         THEN 'o_orderstatus' END,
             |    CASE WHEN old.k IS NOT NULL AND nw.k IS NOT NULL
             |         AND old.pr IS DISTINCT FROM nw.pr
             |         THEN 'o_totalprice' END,
             |    CASE WHEN old.k IS NOT NULL AND nw.k IS NOT NULL
             |         AND old.pz IS DISTINCT FROM nw.pz
             |         THEN 'o_orderpriority' END) AS changed_cols
             |FROM old FULL OUTER JOIN nw ON old.k = nw.k
             |WHERE old.k IS NULL OR nw.k IS NULL
             |   OR old.st IS DISTINCT FROM nw.st
             |   OR old.pr IS DISTINCT FROM nw.pr
             |   OR old.pz IS DISTINCT FROM nw.pz
             |ORDER BY o_orderkey""".stripMargin)),

    /* ---- q82: retention curve (filter-threshold calibration).
     *
     * Before committing to a length cut, a curator wants the whole curve:
     * for each decile threshold of the per-doc token count, how many docs
     * and how many TOKENS survive "keep docs with ≥ threshold tokens"?
     * (Docs and tokens diverge — short docs are many but cheap; the token
     * column is what the training budget actually buys.)
     *
     * Scale shape: thresholds are exact percentile_disc deciles (one
     * aggregation), unpivoted to 9 rows via stack and broadcast; the
     * corpus then cross-joins the 9-row dim and aggregates by decile.
     * The 9× map-side fanout collapses immediately in partial
     * aggregation (each task emits ≤9 rows), so the shuffle carries
     * O(partitions × 9) rows regardless of corpus size. No window over
     * the corpus, no second scan per threshold.
     *
     * percentile_disc (not approx): the threshold is an ACTUAL token
     * count from the data, identical in both engines — q65 pins the
     * discrete-quantile parity this reuses. Both sides cast it to long
     * (Spark's percentile_disc widens to double; the value is integral
     * by construction).
     */
    QueryDef(
      "q82_retention_curve",
      (s, dir) => {
        val tok = docs(s, dir).select(col("doc_id"), nTokens.as("n_tokens"))
        val deciles = (1 to 9).map(i =>
          expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY n_tokens)")
            .cast("long").as(s"t$i"))
        val q = tok.agg(deciles.head, deciles.tail: _*)
        val stackArgs = (1 to 9).map(i => s"$i, t$i").mkString(", ")
        val th = q.selectExpr(s"stack(9, $stackArgs) AS (decile, threshold)")
        tok.crossJoin(broadcast(th))
          .groupBy("decile", "threshold")
          .agg(
            count(when(col("n_tokens") >= col("threshold"), 1))
              .as("docs_retained"),
            coalesce(sum(when(col("n_tokens") >= col("threshold"),
              col("n_tokens"))), lit(0L)).cast("long").as("tokens_retained"))
          .orderBy("decile")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    len(string_split_regex(trim(text), '[ \t\n\f\r]+')) AS n_tokens
             |  FROM documents),
             |q AS (SELECT
             |  CAST(quantile_disc(n_tokens, 0.1) AS BIGINT) t1,
             |  CAST(quantile_disc(n_tokens, 0.2) AS BIGINT) t2,
             |  CAST(quantile_disc(n_tokens, 0.3) AS BIGINT) t3,
             |  CAST(quantile_disc(n_tokens, 0.4) AS BIGINT) t4,
             |  CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) t5,
             |  CAST(quantile_disc(n_tokens, 0.6) AS BIGINT) t6,
             |  CAST(quantile_disc(n_tokens, 0.7) AS BIGINT) t7,
             |  CAST(quantile_disc(n_tokens, 0.8) AS BIGINT) t8,
             |  CAST(quantile_disc(n_tokens, 0.9) AS BIGINT) t9
             |  FROM tok),
             |th AS (SELECT decile,
             |  CASE decile WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
             |    WHEN 4 THEN t4 WHEN 5 THEN t5 WHEN 6 THEN t6
             |    WHEN 7 THEN t7 WHEN 8 THEN t8 ELSE t9 END AS threshold
             |  FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) v(decile)
             |  CROSS JOIN q)
             |SELECT th.decile, th.threshold,
             |  count(CASE WHEN tok.n_tokens >= th.threshold THEN 1 END)
             |    AS docs_retained,
             |  CAST(coalesce(sum(CASE WHEN tok.n_tokens >= th.threshold
             |    THEN tok.n_tokens END), 0) AS BIGINT) AS tokens_retained
             |FROM tok CROSS JOIN th
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    /* ---- q83: per-source dataset card.
     *
     * The governance summary every corpus release ships with: per source,
     * document and token volume, language spread, and how much of the
     * source is exact-duplicate material (fingerprint seen more than once
     * ANYWHERE in the corpus — cross-source, which is exactly what a
     * per-source groupBy alone cannot see).
     *
     * Scale shape: fingerprint = q33's md5-of-normalized-text; duplicate
     * multiplicity is a grouped count on the fingerprint (map-side
     * combine — a boilerplate fingerprint repeated across millions of
     * docs arrives at the reducer as one row per map partition, the same
     * reason q77 uses grouped min over a window) joined back 1:1 by
     * fingerprint, then ONE aggregation by source. Ratios are emitted as
     * exact integer numerator/denominator pairs plus the double ratio —
     * the integers are the auditable values, the double is convenience.
     */
    QueryDef(
      "q83_dataset_card",
      (s, dir) => {
        val d = docs(s, dir).select(
          col("doc_id"), col("source"), col("lang"), col("n_chars"),
          nTokens.as("n_tokens"),
          md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
            .as("fp"))
        val mult = d.groupBy("fp").agg(count(lit(1)).as("fp_count"))
        d.join(mult, "fp")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_tokens")).cast("long").as("tokens_total"),
            sum(col("n_chars")).cast("long").as("chars_total"),
            count(when(col("fp_count") > 1, 1)).as("dup_docs"),
            (count(when(col("fp_count") > 1, 1)).cast("double") /
              count(lit(1)).cast("double")).as("dup_ratio"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, lang, n_chars,
             |    len(string_split_regex(trim(text), '[ \t\n\f\r]+')) AS n_tokens,
             |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             |      AS fp
             |  FROM documents),
             |mult AS (SELECT fp, count(*) AS fp_count FROM d GROUP BY 1)
             |SELECT d.source,
             |  count(*) AS n_docs,
             |  count(DISTINCT d.lang) AS n_langs,
             |  CAST(sum(d.n_tokens) AS BIGINT) AS tokens_total,
             |  CAST(sum(d.n_chars) AS BIGINT) AS chars_total,
             |  count(CASE WHEN mult.fp_count > 1 THEN 1 END) AS dup_docs,
             |  CAST(count(CASE WHEN mult.fp_count > 1 THEN 1 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS dup_ratio
             |FROM d JOIN mult USING (fp)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    /* ---- q84: DSIR-style importance weights (domain matching).
     *
     * Data Selection via Importance Resampling (Xie et al., 2023): score
     * every document by how much more likely its text is under a TARGET
     * domain's n-gram LM than under the general corpus LM — the weight
     * used to up-sample corpus data that "looks like" the target. Target
     * here: the lexicographically first source (deterministic, no
     * literal), standing in for "the curated domain slice".
     *
     * Both LMs are q73's add-1-smoothed bigram model. Per bigram the
     * log-likelihood ratio ln(p_target) − ln(p_corpus) is rounded ONCE
     * to integer micro-nats, so the per-doc sum is order-independent and
     * cross-engine exact (q73's determinism recipe). Unseen-in-target
     * bigrams take the smoothed floor via coalesce(0) on both counts.
     *
     * Scale shape: two grouped count tables per LM (map-side combine),
     * the corpus bigram stream LEFT-joins the target tables (target
     * tables are a SUBSET of the corpus ones — at 100 TB they are the
     * small side and the joins shuffle on (w1,w2)/(w1) like q73's,
     * whose ×16 slope is 0.069), scalar vocab sizes ride a broadcast.
     * No window, no driver loop.
     */
    QueryDef(
      "q84_dsir_weight",
      (s, dir) => {
        val wordRe = "[a-z0-9]+"
        val words = docs(s, dir).select(col("doc_id"), col("source"),
          expr(s"regexp_extract_all(lower(text), '$wordRe', 0)").as("ws"))
        val tgtSrc = words.agg(min(col("source")).as("tgt"))
        val big = words
          .filter(size(col("ws")) >= 2)
          .withColumn("h", slice(col("ws"), lit(1), size(col("ws")) - 1))
          .withColumn("t", slice(col("ws"), lit(2), size(col("ws")) - 1))
          .select(col("doc_id"), col("source"),
            explode(arrays_zip(col("h"), col("t"))).as("bg"))
          .select(col("doc_id"), col("source"),
            col("bg.h").as("w1"), col("bg.t").as("w2"))
        val tbig = big.join(broadcast(tgtSrc), col("source") === col("tgt"))
        val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
        val t12 = tbig.groupBy("w1", "w2").agg(count(lit(1)).as("t12"))
        val t1 = tbig.groupBy("w1").agg(count(lit(1)).as("t1"))
        val vocab = words.select(explode(col("ws")).as("w"))
          .agg(countDistinct(col("w")).as("v"))
        val tvocab = words.join(broadcast(tgtSrc), col("source") === col("tgt"))
          .select(explode(col("ws")).as("w"))
          .agg(countDistinct(col("w")).as("tv"))
        val perDoc = big
          .join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
          .join(t12, Seq("w1", "w2"), "left").join(t1, Seq("w1"), "left")
          .crossJoin(broadcast(vocab)).crossJoin(broadcast(tvocab))
          .select(col("doc_id"),
            round((log((coalesce(col("t12"), lit(0L)) + 1).cast("double") /
              (coalesce(col("t1"), lit(0L)) + col("tv")).cast("double")) -
              log((col("c12") + 1).cast("double") /
                (col("c1") + col("v")).cast("double"))) * 1e6)
              .cast("long").as("mn"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("mn")).cast("long").as("dsir_micro_nats"))
        docs(s, dir).select(col("doc_id"), col("source"))
          .join(perDoc, Seq("doc_id"), "left")
          .crossJoin(broadcast(tgtSrc))
          .select(col("doc_id"),
            (col("source") === col("tgt")).as("in_target"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("dsir_micro_nats"), lit(0L)).as("dsir_micro_nats"))
          .orderBy("doc_id")
      },
      Some("""WITH words AS (
             |  SELECT doc_id, source,
             |         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
             |  FROM documents),
             |tgt AS (SELECT min(source) AS tgt FROM words),
             |big AS (
             |  SELECT doc_id, source, bg[1] AS w1, bg[2] AS w2
             |  FROM (SELECT doc_id, source,
             |          unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS bg
             |        FROM words WHERE len(ws) >= 2)),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
             |t12 AS (SELECT w1, w2, count(*) AS t12 FROM big, tgt
             |        WHERE source = tgt.tgt GROUP BY 1, 2),
             |t1 AS (SELECT w1, count(*) AS t1 FROM big, tgt
             |       WHERE source = tgt.tgt GROUP BY 1),
             |vocab AS (SELECT count(DISTINCT w) AS v
             |          FROM (SELECT unnest(ws) AS w FROM words)),
             |tvocab AS (SELECT count(DISTINCT w) AS tv
             |           FROM (SELECT unnest(ws) AS w FROM words, tgt
             |                 WHERE source = tgt.tgt)),
             |per_doc AS (
             |  SELECT b.doc_id, count(*) AS n_bigrams,
             |    CAST(sum(CAST(round((
             |        ln(CAST(coalesce(t12.t12, 0) + 1 AS DOUBLE)
             |           / CAST(coalesce(t1.t1, 0) + tv.tv AS DOUBLE))
             |      - ln(CAST(c12.c12 + 1 AS DOUBLE)
             |           / CAST(c1.c1 + v.v AS DOUBLE))) * 1000000)
             |      AS BIGINT)) AS BIGINT) AS dsir_micro_nats
             |  FROM big b
             |  JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
             |  LEFT JOIN t12 USING (w1, w2) LEFT JOIN t1 USING (w1)
             |  CROSS JOIN vocab v CROSS JOIN tvocab tv
             |  GROUP BY 1)
             |SELECT d.doc_id, d.source = tgt.tgt AS in_target,
             |  CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  CAST(coalesce(p.dsir_micro_nats, 0) AS BIGINT)
             |    AS dsir_micro_nats
             |FROM documents d CROSS JOIN tgt LEFT JOIN per_doc p USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    /* ---- q86: incremental rollup maintenance (delta algebra).
     *
     * The nightly-metrics question at 100 TB: when a snapshot changes,
     * update the per-group rollup from the CHURN ONLY — never rescan the
     * table. This query computes the new rollup the incremental way
     * (old rollup ⊕ signed deltas from q81's added/removed/changed
     * classes) while the ORACLE computes it the direct way (GROUP BY
     * over the new snapshot) — so the driver's hash gate proves the
     * delta algebra exact, including the group that exists ONLY via
     * mutation ('9-SYNTH' priority) and groups whose last row was
     * removed (count drops to zero → row dropped, matching the direct
     * rollup's absence).
     *
     * Money sums as integer cents (round(price*100)): the ⊕ algebra
     * needs exact cancellation — a double sum would leave ±ulp residue
     * exactly where a group's rows all churned away.
     *
     * Scale shape: old rollup is O(groups); deltas aggregate the diff
     * stream (O(churn)) with map-side combine; the merge is a full-outer
     * join of two group-sized tables. Nothing rescans the unchanged
     * majority.
     */
    QueryDef(
      "q86_incremental_rollup",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val cents = round(col("o_totalprice") * 100).cast("long")
        val old = o.filter(col("o_orderkey") % 10 =!= 3)
          .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
            cents.as("cents"))
        val nw = o.filter(col("o_orderkey") % 10 =!= 7)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 17 === 0, lit("9-SYNTH"))
              .otherwise(col("o_orderpriority")).as("prio"),
            when(col("o_orderkey") % 13 === 0,
              round((col("o_totalprice") + 1) * 100).cast("long")
            ).otherwise(cents).as("cents"))
        // the stored rollup (computed once from the old snapshot;
        // in production this is the table being maintained)
        val oldAgg = old.groupBy("prio")
          .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("c"))
        // signed deltas from the churn stream only: removed/changed-old
        // contribute (-1, -cents); added/changed-new contribute
        // (+1, +cents). Unchanged rows join on (key, prio, cents) and
        // produce no delta rows at all.
        val oldK = old.select(col("o_orderkey").as("k"),
          col("prio").as("op"), col("cents").as("oc"))
        val nwK = nw.select(col("o_orderkey").as("k2"),
          col("prio").as("np"), col("cents").as("nc"))
        val joined = oldK.join(nwK, col("k") === col("k2"), "full_outer")
          .filter(col("k").isNull || col("k2").isNull ||
            !(col("op") <=> col("np")) || !(col("oc") <=> col("nc")))
        val minus = joined.filter(col("k").isNotNull)
          .select(col("op").as("prio"), lit(-1L).as("dn"),
            (-col("oc")).as("dc"))
        val plus = joined.filter(col("k2").isNotNull)
          .select(col("np").as("prio"), lit(1L).as("dn"), col("nc").as("dc"))
        val delta = minus.unionByName(plus).groupBy("prio")
          .agg(sum(col("dn")).as("dn"), sum(col("dc")).cast("long").as("dc"))
        oldAgg.join(delta, Seq("prio"), "full_outer")
          .select(col("prio").as("o_orderpriority"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_orders"),
            (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L)))
              .as("cents_total"))
          .filter(col("n_orders") > 0)
          .orderBy("o_orderpriority")
      },
      Some("""SELECT
             |  CASE WHEN o_orderkey % 17 = 0 THEN '9-SYNTH'
             |       ELSE o_orderpriority END AS o_orderpriority,
             |  count(*) AS n_orders,
             |  CAST(sum(CASE WHEN o_orderkey % 13 = 0
             |    THEN CAST(round((o_totalprice + 1) * 100) AS BIGINT)
             |    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
             |    AS BIGINT) AS cents_total
             |FROM orders WHERE o_orderkey % 10 <> 7
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    /* ---- q85: compression-ratio quality signal (rows-only by design).
     *
     * deflate(text)/len(text) is a classic cheap quality heuristic
     * (Gopher's repetition filters approximate it; NeMo-Curator ships it
     * directly): highly repetitive boilerplate compresses far below
     * ~0.4, random noise sits near 1.0. DuckDB exposes no deflate, so
     * like q70 this is a rows-only driver check — semantics are pinned
     * instead by CurationSpec replaying java.util.zip.Deflater on the
     * driver and by monotonicity envelopes (repetitive ≪ prose < noise).
     *
     * Scale shape: one UDF pass, no shuffle except the final ordering.
     * The UDF is the justified kind: a byte-level codec with no
     * declarative equivalent (same case as MediaCodecs), level pinned
     * explicitly so the output doesn't drift with a JDK default change.
     */
    QueryDef(
      "q85_compress_ratio",
      (s, dir) => {
        val ratio = udf { (text: String) =>
          Option(text).map { t =>
            val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            Curation.deflatedSize(raw).toDouble / math.max(raw.length, 1).toDouble
          }
        }
        docs(s, dir)
          .select(col("doc_id"),
            length(col("text")).as("n_chars_text"),
            ratio(col("text")).as("deflate_ratio"))
          .orderBy("doc_id")
      },
      None)
  )

  /** Size of the zlib DEFLATE stream for `raw` at level 6 (pinned — the
    * Deflater default today, but pinned so a JDK default change cannot
    * silently shift every score).
    */
  def deflatedSize(raw: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }
}
