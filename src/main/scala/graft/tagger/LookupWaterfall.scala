package graft.tagger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core lookup pattern (SURVEY §2.9 C1): a prioritized
  * first-match-wins waterfall of exact -> prefix -> fuzzy catalog lookups
  * (`lookup.py:223-306`), re-expressed set-oriented:
  *
  *   - each leg is a broadcast join of the *remaining misses* (anti-join
  *     chaining encodes the reference's short-circuit semantics — SURVEY
  *     §7.4 risk 2: without explicit leg priority the results differ);
  *   - the fuzzy leg therefore only ever sees the small residue, like the
  *     reference's "fuzzy only on lookup misses" optimization
  *     (`lookup.py:287-304`);
  *   - candidate ranking is a row_number window over (leg, score, probe
  *     position, key) — fully deterministic.
  *
  * At scale: the catalog side is always broadcast (reference catalogs are
  * 10^4–10^5 rows); probes stream through three narrow joins with no
  * repartition of the big side except the final per-id window (one shuffle
  * on id).
  */
object LookupWaterfall {

  /** @param prefixMode "char": catalog key starts with the first
    *                   `prefixLen` chars of the probe (q23 demo form);
    *                   "token": catalog key starts with `probe + " "`
    *                   (the reference's LIKE 'TOKEN %' fallback,
    *                   `lookup.py:117-137`)
    * @param fuzzyMode  "scan": levenshtein <= fuzzyMaxDist over the
    *                   miss-residue x broadcast catalog nested loop with
    *                   length-band + threshold-levenshtein pruning —
    *                   right while the catalog broadcasts (reference
    *                   catalogs are 10^4-10^5 rows);
    *                   "blocked": SymSpell-style deletion-neighborhood
    *                   equi-join (candidates share a <=d-deletion
    *                   variant, then exact verify) — one shuffle on the
    *                   variant key, no nested loop, the shape for
    *                   catalogs too large to broadcast. IDENTICAL
    *                   results to scan (lev(a,b) <= d iff the two
    *                   deletion neighborhoods intersect; exact
    *                   levenshtein verifies every candidate pair);
    *                   "ratio": the REFERENCE's fuzzy semantics
    *                   (`lookup.py:164-220`): rapidfuzz fuzz.ratio >=
    *                   fuzzyRatioMin, probes shorter than 4 chars never
    *                   fuzzy-match, top-`fuzzyLimit` catalog keys per
    *                   probe by ratio. [[graft.tagger.ScoredTagger
    *                   .tagTexts]] defaults to this mode.
    */
  final case class Config(
      prefixMode: String = "token",
      prefixLen: Int = 4,
      fuzzyMaxDist: Int = 2,
      fuzzyMode: String = "scan",
      fuzzyRatioMin: Double = 85.0,
      fuzzyLimit: Int = 3,
      // 0 = unlimited; the reference's prefix lookup keeps the N
      // SHORTEST matching keys per probe (`lookup.py:116-137` ORDER BY
      // LENGTH LIMIT ?) — tagger entry points use [[referenceConfig]]
      prefixLimit: Int = 0)

  /** The configuration the reference's tagger actually runs:
    * `batch_lookup_generics` (`lookup.py:288-304`) calls
    * `lookup_generic_prefix(token, con, limit=3)` and
    * `lookup_generic_fuzzy(token, con, threshold=85, limit=1, ...)` —
    * NOT those functions' signature defaults (5/3). All tagger entry
    * points (ScoredTagger/DrugTagger/DrugsTaggingPipeline) default here
    * so reference parity never depends on the caller passing a config.
    */
  val referenceConfig: Config =
    Config(fuzzyMode = "ratio", fuzzyRatioMin = 85.0, fuzzyLimit = 1,
      prefixLimit = 3)

  /** @param probes  (id, probe_pos, probe) — one row per candidate probe
    * @param catalog (key, ...payload) — broadcastable reference table
    * @return best match per id: probes cols + catalog cols + leg (1=exact,
    *         2=prefix, 3=fuzzy) + score; ids with no match are absent
    *         (callers left-join back and coalesce a no_match reason)
    */
  def tag(probes: DataFrame, catalog: DataFrame, cfg: Config = Config()): DataFrame = {
    val all = allMatches(probes, catalog, cfg)
    val w = Window.partitionBy("id")
      .orderBy(col("leg"), col("score"), col("probe_pos"), col("key"))
    all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Every leg hit (no top-1 ranking) — the candidate set the scoring
    * layer consumes (`tagger.py:728-771` collects all candidates before
    * `select_best_candidate`). Anti-join chaining between legs still
    * applies: later legs only fire for ids the earlier legs missed.
    *
    * Lifecycle: the probe frame is persisted for the duration of ONE
    * eager materialization (it feeds five plan branches; an unpersisted
    * UDF-derived probe frame is re-evaluated per branch — the dominant
    * cost when probes come from the tagger's tokenization UDF), then
    * unpersisted, so repeated calls in a long-lived session do not
    * accumulate cached probe partitions. The materialized result is a
    * local checkpoint: it frees itself via the ContextCleaner when the
    * returned frame is dropped. (On a multi-executor cluster a lost
    * executor invalidates local checkpoints; there, prefer a reliable
    * `spark.sparkContext.setCheckpointDir` + `.checkpoint()` — the
    * candidate frame is small, one row per (id, candidate).)
    */
  def allMatches(probes0: DataFrame, catalog: DataFrame,
      cfg: Config = Config()): DataFrame = {
    val probes = probes0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = legsUnion(probes, catalog, cfg)
    val mat = all.localCheckpoint(eager = true)
    probes.unpersist()
    mat
  }

  /** The lazy three-leg union plan over an (ideally cached) probe frame.
    * Callers that already manage probe persistence (ScoredTagger) use
    * this directly to avoid a second materialization barrier.
    *
    * Waterfall granularity is the PROBE STRING, matching the reference:
    * `lookup.py:223-306` short-circuits exact -> prefix -> fuzzy per
    * looked-up string, and `tagger.py:704-707` batch-caches one result
    * set per unique generic string. A probe string that exact-matched
    * never reaches the fuzzy leg, but a *different* probe of the same id
    * still can — mixed exact + fuzzy candidate sets per id are the norm
    * (that is what feeds the fuzzy-correction feedback, tagger.py:884-896).
    * The anti-join right sides are distinct matched strings (bounded by
    * the broadcastable catalog's key universe), so AQE broadcasts them.
    */
  private[tagger] def legsUnion(probes: DataFrame, catalog: DataFrame,
      cfg: Config = Config()): DataFrame = {
    // an optional boolean `exact_only` column restricts rows to the exact
    // leg: the reference reaches mixture rows ONLY through key equality
    // (`WHERE UPPER(mixture_name) = ?` / `WHERE component_key = ?`,
    // tagger.py:788/341) — they are a separate table outside the
    // unified prefix/fuzzy lookup universe
    val hasExactOnly = catalog.columns.contains("exact_only")
    val cat0 =
      if (hasExactOnly) catalog
      else catalog.withColumn("exact_only", lit(false))
    val cat = broadcast(cat0)
    // without the column the two sides are identical — reuse ONE
    // broadcast instead of re-executing the catalog subplan (q26's demo
    // catalog is a scan+distinct shuffle; computing it twice measurably
    // regressed the bench)
    val catFuzzy =
      if (hasExactOnly) broadcast(cat0.filter(!col("exact_only"))) else cat

    val exact = probes.join(cat, col("probe") === col("key"))
      .withColumn("leg", lit(1)).withColumn("score", lit(0))

    // the probe-side mirror of exact_only: an optional boolean
    // `exact_probe` column marks probes that exist ONLY as equality
    // lookups in the reference (pipe-joined mixture component keys,
    // `tagger.py:327-360` WHERE component_key = ?) — they never enter
    // the prefix or fuzzy legs against the generics universe
    val unifiedProbes =
      if (probes.columns.contains("exact_probe"))
        probes.filter(!col("exact_probe"))
      else probes
    // the miss-chain tracks the UNIFIED lookup only: an exact hit on an
    // exact_only (mixture) row is a separate-table lookup in the
    // reference and must NOT stop the probe from running the prefix and
    // fuzzy legs against the generics universe
    val missExact = unifiedProbes.join(
      exact.filter(!col("exact_only")).select("probe").distinct(),
      Seq("probe"), "left_anti")
    val prefixCond: Column = cfg.prefixMode match {
      case "char" => col("key").startsWith(substring(col("probe"), 1, cfg.prefixLen)) &&
        col("key") =!= col("probe")
      case _ => col("key").startsWith(concat(col("probe"), lit(" ")))
    }
    val prefix0 = missExact.join(catFuzzy, prefixCond)
      .withColumn("leg", lit(2)).withColumn("score", length(col("key")))
    val prefix =
      if (cfg.prefixLimit <= 0) prefix0
      else {
        // reference: 5 shortest keys per probe string; computed on the
        // distinct (probe, key) pairs so repeated probes across ids
        // share one ranking
        val wpp = Window.partitionBy("probe")
          .orderBy(length(col("key")), col("key"))
        val keep = prefix0.select("probe", "key").distinct()
          .withColumn("rnp", row_number().over(wpp))
          .filter(col("rnp") <= cfg.prefixLimit)
          .drop("rnp")
        prefix0.join(keep, Seq("probe", "key"), "left_semi")
      }

    val missPrefix = missExact.join(prefix.select("probe").distinct(), Seq("probe"), "left_anti")
    // length-band pre-filter: levenshtein <= d implies |len(a)-len(b)| <= d,
    // so the cheap predicate prunes most of the broadcast nested loop;
    // the threshold form of levenshtein (Spark 3.5+) early-exits the
    // O(len^2) DP as soon as the band exceeds d (returns -1 above d)
    val lev = levenshtein(col("probe"), col("key"), cfg.fuzzyMaxDist)
    val fuzzy = cfg.fuzzyMode match {
      case "ratio" =>
        // reference semantics: fuzz.ratio >= threshold, len(probe) >= 4,
        // top-N catalog KEYS per distinct probe string by ratio (the
        // rapidfuzz extract over the cached generic list,
        // `lookup.py:185-192`; ties pinned by key). Prefilter: ratio >=
        // t implies indel <= (1-t/100)(la+lb) implies the length band.
        val ratioUdf = udf((p: String, k: String) =>
          graft.functions.FuzzyLib.ratio(p.toUpperCase, k.toUpperCase))
        val frac = 1.0 - cfg.fuzzyRatioMin / 100.0
        val wp = Window.partitionBy("probe")
          .orderBy(col("ratio").desc, col("key"))
        val topKeys = missPrefix.select("probe").distinct()
          .filter(length(col("probe")) >= 4)
          .join(catFuzzy.select("key").distinct(),
            abs(length(col("probe")) - length(col("key"))) <=
              (length(col("probe")) + length(col("key"))) * frac &&
              col("key") =!= col("probe"))
          .withColumn("ratio", ratioUdf(col("probe"), col("key")))
          .filter(col("ratio") >= cfg.fuzzyRatioMin)
          .withColumn("rnf", row_number().over(wp))
          .filter(col("rnf") <= cfg.fuzzyLimit)
          .select(col("probe"), col("key").as("k2"), col("ratio"))
        missPrefix.join(topKeys, Seq("probe"))
          .join(catFuzzy, col("k2") === col("key"))
          .drop("k2")
          .withColumn("leg", lit(3))
          .withColumn("score", round(lit(100.0) - col("ratio")).cast("int"))
          .drop("ratio")
      case "blocked" =>
        val d = cfg.fuzzyMaxDist
        val delUdf = udf((s: String) => deleteVariants(s, d))
        val keyVars = cat0.filter(!col("exact_only"))
          .select(col("key")).distinct()
          .select(col("key"), explode(delUdf(col("key"))).as("variant"))
        val probeVars = missPrefix.select(col("probe")).distinct()
          .select(col("probe"), explode(delUdf(col("probe"))).as("variant"))
        val candPairs = probeVars.join(keyVars, Seq("variant"))
          .select("probe", "key").distinct()
        missPrefix.join(candPairs, Seq("probe"))
          .join(catFuzzy.withColumnRenamed("key", "k2"), col("key") === col("k2"))
          .drop("k2")
          .filter(lev >= 0 && col("key") =!= col("probe"))
          .withColumn("leg", lit(3))
          .withColumn("score", lev)
      case _ =>
        // scan mode keeps the per-row nested loop DELIBERATELY: a
        // dedup-before-compute rewrite (distinct probes × distinct keys,
        // then two join-backs — the ratio/blocked shape) was built and
        // measured in round 12 and REGRESSED both base scale (q26 3.2 →
        // 5.0 s, q23 0.9 → 1.3 s) and the ×32 floor (unchanged ~21 s):
        // with the codegen'd threshold-levenshtein the per-row band scan
        // is cheaper than the added distinct + broadcast join-backs at
        // every measured factor. The modes that pay real per-pair cost
        // (ratio's rapidfuzz UDF, blocked's variant explode) already
        // dedup; scan's per-pair cost is too cheap for dedup to win.
        missPrefix.join(catFuzzy,
            abs(length(col("probe")) - length(col("key"))) <= cfg.fuzzyMaxDist &&
              lev >= 0 && col("key") =!= col("probe"))
          .withColumn("leg", lit(3))
          .withColumn("score", lev)
    }

    exact.unionByName(prefix).unionByName(fuzzy)
  }

  /** All strings reachable from `s` by deleting up to `d` characters —
    * the SymSpell neighborhood: lev(a, b) <= d implies the neighborhoods
    * of a and b intersect (delete each side's unmatched alignment
    * positions), so variant equality is a complete candidate generator
    * and exact levenshtein verification makes it sound.
    */
  private[tagger] def deleteVariants(s: String, d: Int): Seq[String] = {
    if (s == null) return Nil
    var cur = Set(s)
    var all = Set(s)
    for (_ <- 1 to d) {
      cur = cur.flatMap(w =>
        (0 until w.length).map(i => w.substring(0, i) + w.substring(i + 1)))
      all ++= cur
    }
    all.toSeq
  }

  /** leg number -> human-readable match_reason (null-safe: no leg =>
    * no_match), mirroring `tagger.py` match_reason values.
    */
  def reason(leg: Column): Column =
    when(leg === 1, "exact").when(leg === 2, "prefix")
      .when(leg === 3, "fuzzy").otherwise("no_match")
}
