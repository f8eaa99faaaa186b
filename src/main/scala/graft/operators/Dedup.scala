package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables, Ws}

/** Near-duplicate detection over `documents`: n-gram Jaccard via an
  * inverted-index (shared-shingle) join, MinHash+LSH banding, and SimHash.
  *
  * Scale design: no crossJoin anywhere. Candidate pairs come only from
  * docs that share a shingle (q35) or an LSH band key (q36) — the classic
  * inverted-index blocking that keeps pair generation near-linear at 100 TB
  * (pairs shuffle on shingle/band keys). Skewed keys — a stopword shingle
  * or a boilerplate-heavy LSH band shared by millions of docs — would make
  * the self-join quadratic in that key's frequency, so [[capHotKeys]] drops
  * keys hotter than [[HotKeyCap]] BEFORE pair generation (on by default).
  *
  * All hashing is md5 (identical across Spark and the DuckDB oracle), and
  * "minimum over md5 hex strings per seed" is a valid min-wise permutation
  * family for MinHash.
  */
object Dedup {

  /** Default inverted-index hot-key cap: a key shared by more docs than
    * this is dropped before the self-join, bounding any single key's pair
    * contribution to cap² (256² ≈ 65k pairs) regardless of corpus size. A
    * shingle/band this common carries no near-dup signal (it's boilerplate
    * by definition), and the docs it would have connected still pair
    * through their rarer shared keys. Chosen an order of magnitude above
    * the max observed frequency at sf0.1 (25), so test-scale results are
    * byte-identical with the cap on.
    */
  val HotKeyCap = 256

  /** Drop rows whose `keys` value occurs more than `cap` times. The window
    * count partitions by exactly the key the following self-join shuffles
    * on, so the filter rides the join's own exchange (one shuffle total —
    * `.explain` shows the Window and both join sides over the same
    * Exchange, AQE-reused) instead of adding a count+join roundtrip.
    */
  private[operators] def capHotKeys(df: DataFrame, cap: Int, keys: String*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("_kfreq", count(lit(1)).over(w))
      .filter(col("_kfreq") <= cap)
      .drop("_kfreq")
  }

  private[operators] def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** distinct word-3-gram shingles, built WITHOUT outer-capturing lambdas.
    *
    * An index-based formulation (`transform(sequence(...), i =>
    * element_at(t, i)...)`) captures `t` in the lambda body; Catalyst
    * inlines `t`'s defining expression there (CollapseProject + filter
    * pushdown from explode's empty-array pruning), re-running the regex
    * split once per element per evaluation — measured 50x slowdown at
    * sf0.1. zip_with over shifted slices only ever references lambda
    * arguments, so any inlining stays O(tokens) per row. zip_with pads the
    * shorter side with nulls; concat propagates them; filter drops them —
    * yielding exactly the n-2 trigrams.
    */
  private[graft] def shinglesOf(t: Column): Column = {
    val shifted1 = slice(t, lit(2), greatest(size(t) - 1, lit(0)))
    val shifted2 = slice(t, lit(3), greatest(size(t) - 2, lit(0)))
    val tri = zip_with(
      zip_with(t, shifted1, (a, b) => concat(a, lit(" "), b)),
      shifted2,
      (ab, c) => concat(ab, lit(" "), c))
    array_distinct(filter(tri, x => x.isNotNull))
  }

  /** doc_id + exploded distinct shingles (+ shingle-set size).
    *
    * The repartition is both the optimization barrier that keeps the token
    * array materialized below the shingle lambda, and the scale pattern:
    * heavy per-row compute is spread over all cores instead of riding the
    * input file layout (a single parquet file here). The count is PINNED
    * so AQE cannot byte-coalesce the CPU-heavy shingle stage down to a
    * few partitions (see [[graft.core.CpuSpread]]).
    */
  private def shingleIndex(s: SparkSession, dir: String): DataFrame =
    shingleIndexOf(docs(s, dir))

  /** [[shingleIndex]] over an arbitrary (doc_id, text) frame — the entry
    * point [[BandIndex]] uses to shingle ONLY an ingest batch (or only
    * the history side at index-build time) instead of the whole corpus.
    */
  private[operators] def shingleIndexOf(d: DataFrame): DataFrame =
    graft.core.CpuSpread.byKey(
      d.select(col("doc_id"), split(trim(col("text")), Ws.Plus).as("t")),
      col("doc_id"))
      .select(col("doc_id"), shinglesOf(col("t")).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))

  /** Benchmark/corpus sides for the decontamination family (q53
    * exact-broadcast, q95 bloom-prefiltered — see
    * [[SketchExact]]): the benchmark is a deterministic md5-bucket
    * sample (q44's engine-identical lang-salted bucketing, bucket >=
    * 250, ~2.3%) standing in for a held-out eval suite; in production
    * the benchmark side is a separate, small-by-definition table.
    * Returns (bench distinct shingle SET, corpus (doc_id, bucket, shs)).
    */
  private[operators] def decontamSides(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val bucket = conv(
      substring(md5(concat_ws(":",
        coalesce(col("lang"), lit("")), col("doc_id"))), 1, 2),
      16, 10).cast("int")
    val base = docs(s, dir)
      .select(col("doc_id"), bucket.as("bucket"),
        split(trim(col("text")), Ws.Plus).as("t"))
      .select(col("doc_id"), col("bucket"), shinglesOf(col("t")).as("shs"))
    val bench = base.filter(col("bucket") >= 250)
      .select(explode(col("shs")).as("sh")).distinct()
    (bench, base.filter(col("bucket") < 250))
  }

  /** Shared q53/q95 report tail: per-doc hit counts -> containment. */
  private[operators] def decontamAssemble(
      corpus: DataFrame, hits: DataFrame): DataFrame =
    corpus.select(col("doc_id"), size(col("shs")).as("n_sh"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("containment",
        when(col("n_sh") > 0,
          col("n_hit").cast("double") / col("n_sh").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("containment") >= 0.2)
      .orderBy("doc_id")

  /** One oracle for q53 AND q95: the bloom prefilter is an evaluation
    * strategy, not a semantics change (no false negatives; false
    * positives die in the exact confirm join) — the q78/q91
    * materialization-not-semantics gate applied to a sketch.
    */
  private[operators] val DecontamOracle: String =
    """WITH d AS (SELECT doc_id,
      |  CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) AS bucket,
      |  string_split_regex(trim(text), '[ \t\n\f\r]+') AS t FROM documents),
      |sh AS (SELECT doc_id, bucket,
      |         CASE WHEN len(t) >= 3
      |              THEN list_distinct(list_transform(generate_series(1, len(t)-2),
      |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |              ELSE [] END AS shs
      |       FROM d),
      |ev AS (SELECT DISTINCT unnest(shs) AS sh FROM sh WHERE bucket >= 250),
      |ex AS (SELECT doc_id, unnest(shs) AS sh FROM sh WHERE bucket < 250),
      |h AS (SELECT doc_id, count(*) AS n_hit FROM ex JOIN ev USING (sh) GROUP BY 1),
      |c AS (SELECT s.doc_id, len(s.shs) AS n_sh,
      |        CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
      |      FROM sh s LEFT JOIN h ON s.doc_id = h.doc_id
      |      WHERE s.bucket < 250)
      |SELECT doc_id, n_sh, n_hit,
      |  CASE WHEN n_sh > 0 THEN CAST(n_hit AS DOUBLE)/CAST(n_sh AS DOUBLE)
      |       ELSE 0.0 END AS containment,
      |  CASE WHEN n_sh > 0 THEN CAST(n_hit AS DOUBLE)/CAST(n_sh AS DOUBLE)
      |       ELSE 0.0 END >= 0.2 AS contaminated
      |FROM c ORDER BY doc_id""".stripMargin

  /** Capped LSH band keys (8 minhashes, 4 bands x 2 rows) for a
    * (doc_id, sh) exploded-shingle frame — the signature/banding core
    * shared by q36/q39/q48/q59 (via [[minhashPairs]]) and q78's
    * incremental probe (which joins NEW-batch bands against this index
    * instead of self-joining it).
    */
  private[operators] def bandsOf(sh: DataFrame): DataFrame = {
    val minCols = (0 until 8).map(i =>
      min(md5(concat_ws(":", lit(i), col("sh")))).as(s"mh$i"))
    val sig = sh.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 8).map(i => col(s"mh$i")): _*).as("sig"))
    capHotKeys(
      sig.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> md5(concat(sig[b*2], sig[b*2+1])))")))
        .toDF("doc_id", "band_idx", "band_key"),
      HotKeyCap, "band_idx", "band_key")
  }

  /** q36's LSH candidate pairs (8 minhashes, 4 bands x 2 rows), shared by
    * the pair query and the clustering query.
    */
  private[operators] def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOf(docs(s, dir))

  /** [[minhashPairs]] over an arbitrary (doc_id, text) frame — the
    * near-dup pair graph of a pipeline stage's SURVIVOR corpus
    * ([[CurationPipeline]] runs it twice: cluster-apply over the
    * exact-dedup survivors, leakage-safe split over the filtered
    * corpus), identical banding to the corpus queries.
    */
  private[operators] def minhashPairsOf(d: DataFrame): DataFrame = {
    val bands = bandsOf(shingleIndexOf(d).select("doc_id", "sh"))
    // renamed-projection self-join, not as("a")/as("b") aliases: aliased
    // conditions can silently mis-bind when the frame is reused across
    // subtrees of a larger plan (observed in BandIndex.probeIndex's
    // batch leg); renamed top-level attributes cannot
    val bSide = bands.select(col("doc_id").as("d2"),
      col("band_idx").as("b_idx"), col("band_key").as("b_key"))
    bands.join(bSide,
        col("band_idx") === col("b_idx") && col("band_key") === col("b_key")
          && col("doc_id") < col("d2"))
      .select(col("doc_id").as("d1"), col("d2"))
      .distinct()
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: every vertex repeatedly adopts the smallest
    * label among itself and its neighbors until a fixpoint; the component
    * id is the component's minimum vertex id.
    *
    * Scale design: one shuffle per iteration (the neighbor-min
    * aggregation), and each iteration's label frame is EAGERLY
    * locally-checkpointed — without lineage truncation an iterative
    * DataFrame loop doubles its plan every pass and dies at ~15
    * iterations regardless of data size. Iteration count is bounded by
    * the largest component's diameter, which for near-dup clusters is
    * small by construction (duplicate groups are dense); the maxIter
    * guard fails loudly rather than returning half-propagated labels.
    * For adversarial long-chain graphs prefer the large-star/small-star
    * variant (O(log²) rounds); the simple propagation is the right
    * trade for dedup graphs and keeps every step oracle-checkable.
    */
  /** Per-round progress line for the iterative CC loops, gated behind
    * SPARK_GRAFT_CC_LOG (any value): a long-running production CC job is
    * opaque without round cadence, and the line is what diagnosed the
    * scale-curve shape (round COUNT vs per-round cost attribution).
    */
  private def roundLog(kind: String, round: Int, edges: Long,
      t0: Long): Unit =
    if (sys.env.contains("SPARK_GRAFT_CC_LOG"))
      println(f"[cc:$kind] round $round%2d  edges=$edges%-9d  elapsed=${(System.nanoTime() - t0) / 1e9}%7.2f s")

  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint(true) // consumed once per iteration — pin the scan
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // one shuffle per round: neighbor labels + self labels union into a
    // single min-aggregation (no second join to merge back). Convergence
    // check rides the checkpointed result as a tiny aggregate: labels
    // only ever DECREASE, so an unchanged exact sum ⟺ a fixpoint —
    // decimal(38) keeps the sum exact at any realistic vertex count.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // sum over an EMPTY label frame is null (no pairs in the corpus →
      // no vertices); treat as zero so the empty graph converges on the
      // first round instead of NPE-ing the comparison
      Option(df.agg(sum(col("label").cast("decimal(38,0)")))
        .head().getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    val t0 = System.nanoTime()
    while (!converged && it < maxIter) {
      val msgs = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("label"))
        .unionByName(labels)
      val next = msgs.groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      it += 1
      roundLog("prop", it, -1L, t0)
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter iterations")
    labels
  }

  /** Alternating large-star/small-star connected components (the
    * two-phase algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the opt-in alternative to
    * [[connectedComponents]] for ADVERSARIAL graphs: rounds scale with
    * O(log² n) instead of the component diameter, so a pathological
    * long-chain component (which would blow past min-label propagation's
    * maxIter) still converges in a handful of passes.
    *
    * large-star: every node connects its LARGER neighbors to the minimum
    * of its closed neighborhood; small-star: every node connects its
    * smaller neighbors (and itself) to the minimum among them. Both
    * steps preserve connectivity and strictly shrink star height; at the
    * fixpoint every edge is (component-min, member). Each round is two
    * grouped aggregations + joins — the same one-shuffle-per-pass
    * profile as the simple propagation — with eager localCheckpoints
    * truncating the iterative lineage. Convergence detection is two-tier:
    * an exact (count, decimal sum of per-edge xxhash64) checksum is the
    * cheap per-round trigger (a star-fixpoint edge set reproduces
    * itself), and when it fires, an exact `except`-based set-equality
    * check confirms before the loop terminates — so termination is
    * EXACT, not probabilistic, and the confirmation job runs only once,
    * at the fixpoint.
    *
    * Same contract as [[connectedComponents]]: labels every vertex that
    * appears in `edges` with its component's minimum vertex id.
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val vertices = edges.select(col("d1").as("id"))
      .unionByName(edges.select(col("d2").as("id")))
      .distinct()
      .localCheckpoint(true)
    var e = edges
      .select(least(col("d1"), col("d2")).as("a"),
        greatest(col("d1"), col("d2")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    def checksum(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var prev = checksum(e)
    var converged = prev._1 == 0L // empty graph: nothing to do
    var it = 0
    val t0 = System.nanoTime()
    while (!converged && it < maxIter) {
      // ---- large-star: for node u with closed-neighborhood min m,
      //      connect every neighbor v > u to m
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val nbrMin = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(nbrMin, "u")
        .where(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
      // ---- small-star: for node u with smaller-neighbor min m, connect
      //      every smaller neighbor and u itself to m
      val sym2 = ls.select(col("a").as("u"), col("b").as("v"))
        .unionByName(ls.select(col("b").as("u"), col("a").as("v")))
      val neg = sym2.where(col("v") < col("u"))
      val negMin = neg.groupBy("u").agg(min(col("v")).as("m"))
      val ss = neg.join(negMin, "u")
        .select(col("v").as("x"), col("m"))
        .unionByName(negMin.select(col("u").as("x"), col("m")))
        .where(col("x") =!= col("m"))
        .select(col("m").as("a"), col("x").as("b")) // m < x by construction
        .distinct()
        .localCheckpoint(true)
      val cur = checksum(ss)
      // the checksum is the cheap per-round trigger; before actually
      // terminating, confirm with an EXACT set-equality check (equal count
      // from the checksum + one-sided except empty ⟹ equal sets, both are
      // distinct). It runs once, at the fixpoint, so the loop's cost is
      // unchanged — but termination no longer rests on xxhash64 being
      // collision-free on a correctness-critical path: a colliding
      // not-yet-fixed edge set fails the exact check and the loop continues.
      converged = cur == prev && ss.except(e).isEmpty
      prev = cur
      e = ss
      it += 1
      roundLog("star", it, cur._1, t0)
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixpoint edges are star edges (component-min, member); centers and
    // any singleton-collapsed vertex label themselves
    vertices
      .join(e.select(col("b").as("id"), col("a").as("label")), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Shared DuckDB oracle for q39/q48: min-reachable-id per vertex of the
    * LSH pair graph via a recursive CTE. Both CC variants must land on
    * identical components.
    */
  /** Shared oracle prefix: the capped-band LSH candidate pair graph
    * (pairs + undirected edges), reused by the clusters oracle (with a
    * recursive reach tail) and q59's split-leakage oracle (without).
    */
  private[operators] val pairsCte: String =
    """tt AS (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\f\r]+') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         generate_series(1, len(t)-2),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      |       FROM tt WHERE len(t) >= 3),
      |mh AS (SELECT doc_id, s.seed AS seed, min(md5(s.seed || ':' || sh)) AS mh
      |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
      |       GROUP BY 1,2),
      |sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1),
      |bands AS (SELECT doc_id, b AS band_idx, md5(sig[2*b+1] || sig[2*b+2]) AS band_key
      |          FROM sig CROSS JOIN (SELECT unnest(generate_series(0,3)) AS b) bb),
      |pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |          FROM bands a JOIN bands b
      |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      |               AND a.doc_id < b.doc_id),
      |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
      |          UNION ALL SELECT d2, d1 FROM pairs)""".stripMargin

  private val clustersCte: String = clustersCteOver("documents")

  /** The pair-graph + recursive-reach CTE chain over an arbitrary input
    * relation — the SAME text as [[pairsCte]]/`clustersCte` with only
    * the source relation substituted (`.replace` on the one constant,
    * so the standalone oracles and any composed pipeline oracle cannot
    * drift). Used twice by [[CurationPipeline]]'s q115 oracle.
    */
  private[operators] def clustersCteOver(input: String): String =
    "WITH RECURSIVE\n" + pairsCte.replace("FROM documents", "FROM " + input) +
      """,
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)""".stripMargin

  private val clustersOracle: String = clustersCte +
    """
      |SELECT id AS doc_id, min(r) AS cluster_id
      |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  /** q56's cluster-apply tail — labels + keep-every-representative —
    * over an arbitrary input relation and projection, appended after a
    * [[clustersCteOver]] chain. Shared by q56 and q115.
    */
  private[operators] def nearDupKeepTail(input: String, cols: String): String =
    s""",
       |labels AS (SELECT id AS doc_id, min(r) AS cluster_id
       |           FROM reach GROUP BY 1)
       |SELECT $cols
       |FROM $input d LEFT JOIN labels l ON d.doc_id = l.doc_id
       |WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id""".stripMargin

  /** q103's group-id CTE (near-dup cluster label, own id when unpaired)
    * over an arbitrary input relation, appended after a
    * [[clustersCteOver]] chain. Shared by q103 and q115.
    */
  private[operators] def groupSplitGrpCte(input: String): String =
    s""",
       |grp AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_id
       |        FROM $input d LEFT JOIN (
       |          SELECT id AS doc_id, min(r) AS cluster_id
       |          FROM reach GROUP BY 1) c USING (doc_id))""".stripMargin

  /** q103's train/eval decision over `group_id` — the hash boundary the
    * leakage-safe split guarantees by construction. Shared by q103 and
    * q115.
    */
  private[operators] val GroupSplitCase: String =
    """CASE WHEN CAST('0x' || substr(md5('g:' || CAST(group_id AS VARCHAR)), 1, 2) AS INT) < 204
      |       THEN 'train' ELSE 'eval' END""".stripMargin

  /** The decontamination-apply CTE chain over an arbitrary corpus
    * relation (doc_id, lang, text): benchmark shingles from `benchRel`'s
    * bucket >= 250 docs (the fixed held-out eval suite — it never flows
    * through the pipeline), corpus shingles from `corpusRel` rows, hit
    * counts and the per-doc verdict columns in `c`. Shared by q105 and
    * q115 so the apply semantics cannot drift between the standalone
    * query and the composed pipeline.
    */
  private[operators] def decontamApplyCtes(
      corpusRel: String, benchRel: String): String =
    benchShingleCtes(benchRel) + ",\n" + corpusShingleCtes(corpusRel, "")

  /** The benchmark side of [[decontamApplyCtes]] alone (bd/bsh/ev: the
    * held-out slice's distinct trigram shingles) — the stationary
    * artifact a maintenance oracle (q118) instantiates once while the
    * corpus side runs per phase.
    */
  private[operators] def benchShingleCtes(benchRel: String): String =
    ("""bd AS (SELECT doc_id, lang,
       |  CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) AS bucket,
       |  string_split_regex(trim(text), '[ \t\n\f\r]+') AS t FROM BENCHREL),
       |bsh AS (SELECT doc_id,
       |         CASE WHEN len(t) >= 3
       |              THEN list_distinct(list_transform(generate_series(1, len(t)-2),
       |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |              ELSE [] END AS shs
       |       FROM bd WHERE bucket >= 250),
       |ev AS (SELECT DISTINCT unnest(shs) AS sh FROM bsh)""").stripMargin
      .replace("BENCHREL", benchRel)

  /** The corpus side of [[decontamApplyCtes]] (shingles → indexed-hit
    * count → per-doc verdict columns in `c<sfx>`), CTE names suffixed
    * so a maintenance oracle can score each phase's spliced batch
    * against the one `ev`. ("", corpusRel) reproduces q105/q115's
    * text verbatim — one containment algebra for all three gates.
    */
  private[operators] def corpusShingleCtes(
      corpusRel: String, sfx: String): String =
    ("""cdSFX AS (SELECT doc_id, lang,
       |  string_split_regex(trim(text), '[ \t\n\f\r]+') AS t FROM CORPUSREL),
       |cshSFX AS (SELECT doc_id, lang,
       |         CASE WHEN len(t) >= 3
       |              THEN list_distinct(list_transform(generate_series(1, len(t)-2),
       |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |              ELSE [] END AS shs
       |       FROM cdSFX),
       |hSFX AS (SELECT doc_id, count(*) AS n_hit
       |      FROM (SELECT doc_id, unnest(shs) AS sh FROM cshSFX) ex
       |      JOIN ev USING (sh) GROUP BY 1),
       |cSFX AS (SELECT s.doc_id, s.lang, len(s.shs) AS n_sh,
       |        CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
       |      FROM cshSFX s LEFT JOIN hSFX h ON s.doc_id = h.doc_id)""").stripMargin
      .replace("cdSFX", "cd" + sfx).replace("cshSFX", "csh" + sfx)
      .replace("hSFX", "h" + sfx).replace("cSFX", "c" + sfx)
      .replace("CORPUSREL", corpusRel)

  /** The q105/q115 keep predicate: containment < 0.2. */
  private[operators] val DecontamKeepWhere: String =
    """NOT (CASE WHEN n_sh > 0 THEN CAST(n_hit AS DOUBLE)/CAST(n_sh AS DOUBLE)
      |                ELSE 0.0 END >= 0.2)""".stripMargin

  /** The md5 ingest-bucket expression as oracle SQL ([[BandIndex
    * .ingestBucket]]'s DuckDB twin) — the corpus/benchmark boundary. */
  private[operators] val BucketSql: String =
    "CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT)"

  val defs: Seq[QueryDef] = Seq(

    // ---- n-gram Jaccard near-dup pairs via inverted-index join
    QueryDef(
      "q35_ngram_jaccard",
      (s, dir) => {
        val ex = capHotKeys(shingleIndex(s, dir), HotKeyCap, "sh")
        ex.as("x").join(ex.as("y"),
            col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(
            col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            col("x.n_sh").as("s1"), col("y.n_sh").as("s2"))
          .agg(count(lit(1)).as("inter"))
          .withColumn("jacc",
            col("inter").cast("double")
              / (col("s1") + col("s2") - col("inter")).cast("double"))
          .filter(col("jacc") >= 0.2)
          .select("d1", "d2", "s1", "s2", "inter", "jacc")
          .orderBy("d1", "d2")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
             |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shs
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\f\r]+') AS t FROM documents)
             |  WHERE len(t) >= 3),
             |ex AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM d),
             |p AS (SELECT x.doc_id AS d1, y.doc_id AS d2, x.n_sh AS s1, y.n_sh AS s2,
             |        count(*) AS inter
             |      FROM ex x JOIN ex y ON x.sh = y.sh AND x.doc_id < y.doc_id
             |      GROUP BY 1,2,3,4)
             |SELECT d1, d2, s1, s2, inter,
             |  CAST(inter AS DOUBLE)/CAST(s1+s2-inter AS DOUBLE) AS jacc
             |FROM p WHERE CAST(inter AS DOUBLE)/CAST(s1+s2-inter AS DOUBLE) >= 0.2
             |ORDER BY d1, d2""".stripMargin)),

    // ---- MinHash (8 hashes) + LSH (4 bands x 2 rows) candidate pairs
    // All 8 minhashes compute in ONE aggregation pass (8 partial mins
    // with map-side combine) instead of a seed crossJoin +
    // per-(doc,seed) shuffle — one shuffle total, no row blowup (see
    // minhashPairs).
    QueryDef(
      "q36_minhash_lsh",
      (s, dir) => minhashPairs(s, dir).orderBy("d1", "d2"),
      Some("""WITH tt AS (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\f\r]+') AS t FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |         generate_series(1, len(t)-2),
             |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             |       FROM tt WHERE len(t) >= 3),
             |mh AS (SELECT doc_id, s.seed AS seed, min(md5(s.seed || ':' || sh)) AS mh
             |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
             |       GROUP BY 1,2),
             |sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY 1),
             |bands AS (SELECT doc_id, b AS band_idx, md5(sig[2*b+1] || sig[2*b+2]) AS band_key
             |          FROM sig CROSS JOIN (SELECT unnest(generate_series(0,3)) AS b) bb)
             |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
             |FROM bands a JOIN bands b
             |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
             |ORDER BY d1, d2""".stripMargin)),

    // ---- near-dup CLUSTERS: connected components over the LSH pair graph
    // (dedup pipelines need one representative per duplicate GROUP, not
    // pairs; the canonical keep-rule "retain min doc_id per component" is
    // exactly the cluster_id this emits)
    QueryDef(
      "q39_dedup_clusters",
      (s, dir) => connectedComponents(minhashPairs(s, dir))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
        .orderBy("doc_id"),
      Some(clustersOracle)),

    // ---- the same clusters via the large-star/small-star variant, under
    // the SAME recursive-CTE oracle — proves the adversarial-graph
    // algorithm computes identical components on the real LSH pair
    // graph, not just on the spec's synthetic graphs
    QueryDef(
      "q48_dedup_clusters_star",
      (s, dir) => connectedComponentsStar(minhashPairs(s, dir))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
        .orderBy("doc_id"),
      Some(clustersOracle)),

    // ---- benchmark decontamination: flag corpus docs whose word-trigram
    // set overlaps an eval/benchmark sample (the train-on-test leak check
    // every LLM data pipeline runs before training). The benchmark here
    // is a deterministic md5-bucket sample of the corpus (bucket >= 250,
    // ~2.3%) standing in for a held-out eval suite; in production the
    // benchmark side is a separate, small-by-definition table. The join
    // side is the benchmark's DISTINCT shingle SET — set membership, not
    // per-doc pairs — so each corpus shingle matches at most once and the
    // broadcast join has zero fanout regardless of how common a trigram
    // is (no hot-key cap needed). Corpus side: one scan, one groupBy.
    QueryDef(
      "q53_decontam",
      (s, dir) => {
        val (bench, corpus) = decontamSides(s, dir)
        // shinglesOf is distinct per doc and bench is a distinct set, so
        // count(*) after the semi-shaped inner join = |doc ∩ bench|
        val hits = corpus
          .select(col("doc_id"), explode(col("shs")).as("sh"))
          .join(broadcast(bench), Seq("sh"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        decontamAssemble(corpus, hits)
      },
      Some(DecontamOracle)),

    // ---- cross-split leakage: eval docs that are LSH near-dups of a
    // TRAIN doc — the split-hygiene check run before training (a random
    // split scatters near-dup groups across the boundary; leaked eval
    // rows measure memorization, not generalization). Composes q44's
    // deterministic md5 split with q36's capped LSH candidate pairs: an
    // equi-join membership probe against the train side (a shuffle
    // join, NOT a broadcast — train is half the corpus by construction)
    // then a grouped partner count per eval doc. The remediation path
    // is q56-shaped: drop leaked eval docs or re-assign whole q39
    // clusters to one side of the split.
    QueryDef(
      "q59_split_leakage",
      (s, dir) => {
        val bucket = conv(
          substring(md5(concat_ws(":",
            coalesce(col("lang"), lit("")), col("doc_id"))), 1, 2),
          16, 10).cast("int")
        val split = docs(s, dir).select(col("doc_id"),
          when(bucket < 204, lit("train")).otherwise(lit("eval")).as("split"))
        val pairs = minhashPairs(s, dir)
        val und = pairs.select(col("d1").as("doc_id"), col("d2").as("other"))
          .unionByName(pairs.select(col("d2").as("doc_id"), col("d1").as("other")))
        val train = split.filter(col("split") === "train")
          .select(col("doc_id").as("other"))
        // pairs are distinct, so count(*) = distinct train partners
        val leak = und.join(train, "other")
          .groupBy("doc_id").agg(count(lit(1)).as("n_train_dups"))
        split.filter(col("split") === "eval").select("doc_id")
          .join(leak, Seq("doc_id"), "left")
          .withColumn("n_train_dups", coalesce(col("n_train_dups"), lit(0L)))
          .withColumn("leaked", col("n_train_dups") > 0)
          .orderBy("doc_id")
      },
      Some("WITH " + pairsCte +
        """,
          |sp AS (SELECT doc_id,
          |         CASE WHEN CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) < 204
          |              THEN 'train' ELSE 'eval' END AS split
          |       FROM documents),
          |leak AS (SELECT e.src AS doc_id, count(*) AS n_train_dups
          |         FROM edges e JOIN sp t ON t.doc_id = e.dst AND t.split = 'train'
          |         GROUP BY 1)
          |SELECT s.doc_id,
          |  COALESCE(l.n_train_dups, 0) AS n_train_dups,
          |  COALESCE(l.n_train_dups, 0) > 0 AS leaked
          |FROM sp s LEFT JOIN leak l ON l.doc_id = s.doc_id
          |WHERE s.split = 'eval'
          |ORDER BY s.doc_id""".stripMargin)),

    // ---- decontamination APPLICATION, completing the detect→apply
    // pair the dedup family already has (q36/q39 detect → q56 applies):
    // materialize the training corpus a run would actually read after
    // q53's verdicts — every corpus doc NOT contaminated (containment
    // < 0.2), carried with its evidence columns so downstream mixing
    // stages (q57/q84) can re-weight without re-deriving. Same plan
    // skeleton as q53 (broadcast benchmark set, zero fanout, one
    // grouped count) plus one join back to the docs table for lang —
    // the apply adds no new shuffle class, which is the point: at
    // 100 TB the decision and the materialization share one scan.
    QueryDef(
      "q105_decontam_apply",
      (s, dir) => {
        val (bench, corpus) = decontamSides(s, dir)
        val hits = corpus
          .select(col("doc_id"), explode(col("shs")).as("sh"))
          .join(broadcast(bench), Seq("sh"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        decontamAssemble(corpus, hits)
          .filter(!col("contaminated"))
          .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
          .select("doc_id", "lang", "n_sh", "n_hit")
          .orderBy("doc_id")
      },
      Some("WITH " + decontamApplyCtes(
        s"(SELECT doc_id, lang, text FROM documents WHERE $BucketSql < 250)",
        "documents") +
        "\nSELECT doc_id, lang, n_sh, n_hit FROM c\nWHERE " +
        DecontamKeepWhere + "\nORDER BY doc_id")),

    // ---- the REMEDIATION q59's scaladoc names: a leakage-safe split.
    // Split by near-dup GROUP, not by doc — every doc carries its q39
    // cluster label (own doc_id when unpaired) and the train/eval
    // decision hashes the GROUP id, so a near-dup pair can never
    // straddle the boundary BY CONSTRUCTION (the spec re-runs q59's
    // leak probe against this split and gets zero rows). Scale shape:
    // the labels come from the already-curved CC loop over the
    // near-dup subset only; everything after is one doc_id-keyed join
    // back plus a map-side hash — no new shuffle class. At 100 TB this
    // is the standard fix for memorization-contaminated evals: the
    // boundary is a pure function of the group fingerprint, so no
    // coordination or global state is needed to keep future re-splits
    // consistent.
    QueryDef(
      "q103_leakage_safe_split",
      (s, dir) => {
        val clusters = connectedComponents(minhashPairs(s, dir))
          .select(col("id").as("doc_id"), col("label").as("cluster_id"))
        val grp = docs(s, dir).select(col("doc_id"))
          .join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
        val bucket = conv(substring(md5(
          concat(lit("g:"), col("group_id").cast("string"))), 1, 2), 16, 10)
          .cast("int")
        grp.withColumn("split",
            when(bucket < 204, lit("train")).otherwise(lit("eval")))
          .orderBy("doc_id")
      },
      Some(clustersCte + groupSplitGrpCte("documents") +
        s"\nSELECT doc_id, group_id,\n  $GroupSplitCase AS split" +
        "\nFROM grp ORDER BY doc_id")),

    // ---- dedup APPLICATION: materialize the deduplicated corpus — keep
    // every doc that is its cluster's representative (minimum doc_id)
    // or appears in no near-dup pair at all. This closes the loop from
    // pair detection (q36) and cluster labeling (q39/q48) to the actual
    // corpus a training run would read: one left join of the corpus
    // against the (small) label frame — docs without an LSH pair never
    // enter the CC iteration at all, so the expensive path only touches
    // the near-dup subset.
    QueryDef(
      "q56_dedup_apply",
      (s, dir) => {
        val labels = connectedComponents(minhashPairs(s, dir))
          .withColumnRenamed("id", "doc_id")
        docs(s, dir)
          .join(labels, Seq("doc_id"), "left")
          .filter(col("label").isNull || col("label") === col("doc_id"))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(clustersCte +
        nearDupKeepTail("documents", "d.doc_id, d.lang, d.n_chars") +
        "\nORDER BY d.doc_id")),

    // ---- SimHash: 16-bit signature from md5 bits of distinct tokens
    QueryDef(
      "q37_simhash",
      (s, dir) => {
        val tok = docs(s, dir)
          .select(col("doc_id"),
            explode(array_distinct(split(trim(lower(col("text"))), Ws.Plus))).as("tok"))
        // 16-way bit fanout as a generator (posexplode of a literal
        // sequence) instead of a broadcast crossJoin: same row count, no
        // join operator, stays in one whole-stage-codegen span
        val bits = tok.select(col("doc_id"), col("tok"),
          explode(sequence(lit(0L), lit(15L))).as("b"))
        bits
          .withColumn("h", md5(col("tok")))
          .withColumn("digit", expr("substring(h, cast(b div 4 as int) + 1, 1)"))
          .withColumn("dv", expr("instr('0123456789abcdef', digit) - 1"))
          .withColumn("bit", expr(
            "cast(floor(dv / element_at(array(8,4,2,1), cast(b % 4 as int) + 1)) as int) % 2"))
          .groupBy("doc_id", "b")
          .agg(sum(col("bit") * 2 - 1).as("vote"))
          .withColumn("simbit", when(col("vote") > 0, "1").otherwise("0"))
          .groupBy("doc_id")
          .agg(expr(
            "array_join(transform(array_sort(collect_list(struct(b, simbit))), s -> s.simbit), '')")
            .as("simhash"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |         unnest(list_distinct(string_split_regex(trim(lower(text)), '[ \t\n\f\r]+'))) AS tok
             |       FROM documents),
             |v AS (SELECT doc_id, b, sum(2*bit - 1) AS vote FROM (
             |        SELECT doc_id, bb.b AS b,
             |          CAST(floor((strpos('0123456789abcdef',
             |                             substr(md5(tok), (bb.b//4)+1, 1)) - 1)
             |                     / ([8,4,2,1][(bb.b%4)+1])) AS INT) % 2 AS bit
             |        FROM tok CROSS JOIN (SELECT unnest(generate_series(0,15)) AS b) bb) t
             |      GROUP BY 1,2)
             |SELECT doc_id,
             |  string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
             |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    /* Cross-source overlap matrix — per ordered source pair, the shared
     * word-trigram shingle count and shingle-set Jaccard. The curation
     * diagnostic behind "which crawls/dumps duplicate each other":
     * unlike per-doc near-dup (q35/q36), the unit here is the SOURCE, so
     * the join side is the DISTINCT (source, shingle) set — corpus-
     * sublinear — and the self-join's per-shingle fanout is bounded by
     * (#sources choose 2), never by document frequency: no hot-key cap
     * needed because the blow-up dimension is the source catalog, a
     * bounded dimension by contract. Two shuffles (distinct, then the
     * shingle equi-join) + two tiny grouped aggregates; output is
     * #source-pairs rows. Pairs with zero overlap are absent by
     * construction on both engines.
     */
    QueryDef(
      "q76_source_overlap",
      (s, dir) => {
        val srcSh = graft.core.CpuSpread.byKey(
          docs(s, dir)
            .select(col("source"), col("doc_id"),
              split(trim(col("text")), Ws.Plus).as("t")),
          col("doc_id"))
          .select(col("source"), explode(shinglesOf(col("t"))).as("sh"))
          .distinct()
        val tot = srcSh.groupBy("source").agg(count(lit(1)).as("n"))
        // renamed-projection self-join (see minhashPairs' comment)
        val bSide = srcSh.select(col("source").as("source_b"),
          col("sh").as("sh_b"))
        srcSh
          .join(bSide,
            col("sh") === col("sh_b") && col("source") < col("source_b"))
          .groupBy(col("source").as("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .join(tot.select(col("source").as("source_a"), col("n").as("n_a")), "source_a")
          .join(tot.select(col("source").as("source_b"), col("n").as("n_b")), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
            col("n_a"), col("n_b"),
            (col("n_shared").cast("double") /
              (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
              .as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH tt AS (SELECT source, string_split_regex(trim(text), '[ \t\n\f\r]+') AS t
             |           FROM documents),
             |sh0 AS (SELECT DISTINCT source, unnest(list_distinct(list_transform(
             |          generate_series(1, len(t)-2),
             |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             |        FROM tt WHERE len(t) >= 3),
             |tot AS (SELECT source, count(*) AS n FROM sh0 GROUP BY 1),
             |shared AS (SELECT a.source AS source_a, b.source AS source_b,
             |             count(*) AS n_shared
             |           FROM sh0 a JOIN sh0 b
             |             ON a.sh = b.sh AND a.source < b.source
             |           GROUP BY 1, 2)
             |SELECT s.source_a, s.source_b, s.n_shared,
             |  ta.n AS n_a, tb.n AS n_b,
             |  CAST(s.n_shared AS DOUBLE)
             |    / CAST(ta.n + tb.n - s.n_shared AS DOUBLE) AS jaccard
             |FROM shared s
             |JOIN tot ta ON ta.source = s.source_a
             |JOIN tot tb ON tb.source = s.source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    /* Repeated-span removal: exact segment-level dedup at fixed 16-token
     * granularity (the practical distributed form of suffix-array
     * substring dedup, Lee et al. "Deduplicating Training Data Makes
     * Language Models Better", ACL'22 — exact repeated SPANS removed
     * corpus-wide while the containing docs survive; doc-level dedup
     * (q34/q56) can't touch boilerplate embedded in otherwise-unique
     * docs). Each doc splits into non-overlapping 16-token segments
     * (q55's posexplode(sequence)+slice shape); a segment occurrence
     * survives iff it is the globally FIRST occurrence of its md5 in
     * (doc_id, seg_idx) order; each doc is rebuilt from its surviving
     * segments.
     *
     * Scale design: keep-first is a grouped min(struct(doc_id,seg_idx))
     * per segment hash + a 1:1 join-back — NOT a window over the hash. A
     * boilerplate segment repeated in millions of docs would make a
     * window partition with millions of rows (the hot-key problem the
     * near-dup family caps away), while the grouped min combines
     * map-side, so the hottest possible segment contributes one row per
     * map partition to the shuffle; the join-back fans out 1:1 because
     * the min frame is keyed by distinct hash. Reconstruction is the
     * q37 pattern: array_sort(collect_list(struct)) per doc — segments
     * per doc are bounded (tokens/16), so the per-group array is small.
     */
    QueryDef(
      "q77_segment_dedup",
      (s, dir) => {
        val segTok = 16
        val seg = graft.core.CpuSpread.byKey(
          docs(s, dir).filter(trim(col("text")) =!= "")
            .select(col("doc_id"), split(trim(col("text")), Ws.Plus).as("t")),
          col("doc_id"))
          .select(col("doc_id"), col("t"),
            posexplode(sequence(lit(1), size(col("t")), lit(segTok)))
              .as(Seq("seg_idx", "start")))
          .select(col("doc_id"), col("seg_idx"),
            array_join(slice(col("t"), col("start"), lit(segTok)), " ").as("seg"))
          .withColumn("h", md5(col("seg")))
        val first = seg.groupBy("h")
          .agg(min(struct(col("doc_id"), col("seg_idx"))).as("f"))
          .select(col("h"), col("f.doc_id").as("f_doc"),
            col("f.seg_idx").as("f_idx"))
        val marked = seg.join(first, "h")
          .withColumn("kept",
            col("doc_id") === col("f_doc") && col("seg_idx") === col("f_idx"))
        marked.groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_seg"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            array_join(
              expr("transform(array_sort(collect_list(CASE WHEN kept THEN struct(seg_idx, seg) END)), x -> x.seg)"),
              " ").as("dedup_text"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |         string_split_regex(trim(text), '[ \t\n\f\r]+') AS t
             |       FROM documents WHERE trim(text) <> ''),
             |e AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 16)) AS s
             |      FROM d),
             |seg AS (SELECT doc_id, CAST((s-1)/16 AS INT) AS seg_idx,
             |          array_to_string(t[s:least(s+15, len(t))], ' ') AS seg
             |        FROM e),
             |m AS (SELECT doc_id, seg_idx, seg,
             |        row_number() OVER (PARTITION BY md5(seg)
             |                           ORDER BY doc_id, seg_idx) = 1 AS kept
             |      FROM seg)
             |SELECT doc_id, count(*) AS n_seg,
             |  count(*) FILTER (WHERE kept) AS n_kept,
             |  COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
             |             FILTER (WHERE kept), '') AS dedup_text
             |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    /* Incremental dedup: probe a NEW ingest batch against the historical
     * LSH band index instead of re-deduplicating the whole corpus — the
     * shape that makes near-dup detection affordable on a CONTINUOUSLY
     * ingesting 100-TB corpus. The history index is a PERSISTED parquet
     * table bucketed by (band_idx, band_key) ([[BandIndex]]): built once
     * per corpus generation (fingerprint-guarded), so the per-run cost
     * is O(batch) shingling + an equi-join whose only exchange is on the
     * batch side (the bucketed scan satisfies the join's clustered
     * distribution — round 9 recomputed the history bands every run,
     * which made the benched per-batch cost O(corpus) and the curve
     * superlinear at ×16; this is the fix). The batch is a deterministic
     * ~10% md5-bucket slice (bucket >= 230, q44's engine-identical
     * bucketing) standing in for an ingest delta. Each new doc reports
     * its distinct near-dup partners in history AND among EARLIER batch
     * docs (smaller doc_id — the within-batch keep-first), and is
     * admitted iff it has neither: exactly the q36→q56 detect→apply
     * loop, restated incrementally. Bands are capped per SIDE (the cap
     * never fires at test SF so the oracle needs no cap arm — see
     * [[BandIndex]]'s scaladoc for why per-side is the incremental
     * contract). [[BandIndex.append]] closes the maintenance loop
     * (ingest → probe → admit → append), chained-batch-vs-recompute
     * proven in BandIndexSpec.
     */
    QueryDef(
      "q78_incremental_dedup",
      (s, dir) => BandIndex.probe(s, dir),
      Some("WITH " + pairsCte +
        """,
          |bk AS (SELECT doc_id,
          |         CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) AS bucket
          |       FROM documents),
          |hist AS (SELECT b.doc_id AS hist_id, b.band_idx, b.band_key
          |         FROM bands b JOIN bk ON bk.doc_id = b.doc_id
          |         WHERE bk.bucket < 230),
          |newb AS (SELECT b.doc_id, b.band_idx, b.band_key
          |         FROM bands b JOIN bk ON bk.doc_id = b.doc_id
          |         WHERE bk.bucket >= 230),
          |hd AS (SELECT doc_id, count(*) AS n_hist_dups FROM (
          |         SELECT DISTINCT n.doc_id, h.hist_id
          |         FROM newb n JOIN hist h
          |           ON n.band_idx = h.band_idx AND n.band_key = h.band_key) t
          |       GROUP BY 1),
          |bd AS (SELECT doc_id, count(*) AS n_batch_dups FROM (
          |         SELECT DISTINCT a.doc_id, b.doc_id AS oid
          |         FROM newb a JOIN newb b
          |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
          |              AND b.doc_id < a.doc_id) t
          |       GROUP BY 1)
          |SELECT k.doc_id,
          |  COALESCE(hd.n_hist_dups, 0) AS n_hist_dups,
          |  COALESCE(bd.n_batch_dups, 0) AS n_batch_dups,
          |  COALESCE(hd.n_hist_dups, 0) = 0
          |    AND COALESCE(bd.n_batch_dups, 0) = 0 AS admit
          |FROM bk k
          |LEFT JOIN hd ON hd.doc_id = k.doc_id
          |LEFT JOIN bd ON bd.doc_id = k.doc_id
          |WHERE k.bucket >= 230
          |ORDER BY k.doc_id""".stripMargin)),

    /* SimHash near-dup PAIRS by Hamming distance, via the pigeonhole
     * multi-index of Manku, Jain & Sarma ("Detecting Near-Duplicates for
     * Web Crawling", WWW'07): a 64-bit signature split into 4 chunks of
     * 16 bits — any two signatures within Hamming distance 3 agree on at
     * least one whole chunk (3 differing bits corrupt at most 3 chunks),
     * so candidate generation is 4 equi-joins on (chunk_idx, chunk_key)
     * unioned by the generator explode, never an all-pairs comparison.
     * This closes the loop q37 opens: q37 emits signatures, this emits
     * the actual near-dup pairs at the canonical 64-bit/k=3 operating
     * point.
     *
     * Scale design: the signature is ONE hash aggregate with 64
     * conditional-sum columns over the token rows — zero row fanout,
     * unlike q37's 16-way bit-generator (the right demo shape there, the
     * wrong cost at 64 bits) — and chunk keys draw from 2^16 values, so
     * buckets stay fine-grained as the corpus grows ([[capHotKeys]]
     * guards the degenerate boilerplate-signature case like every other
     * inverted index here). The exact Hamming verify runs only on
     * chunk-collision survivors.
     */
    QueryDef(
      "q80_simhash_pairs",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // the signature is ONE native expression per doc (SimHashSig —
        // md5 bytes, no hex round-trip, int[64] votes): computed
        // map-side with zero row fanout and zero signature exchange.
        // Two earlier cuts are recorded in its scaladoc: 64 separate
        // substring+instr string expressions (16.8 s at sf0.1), then
        // the 64-conditional-sum hash aggregate over exploded token
        // rows (8.3 s) — the expression removes the explode AND the
        // 64-long-column aggregate exchange those paid.
        val sig = graft.core.CpuSpread.byKey(
          docs(s, dir).select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"),
            call_function("graft_simhash_sig",
              trim(lower(col("text")))).as("s"))
        val chunks = capHotKeys(
          sig.select(col("doc_id"), col("s"),
            explode(sequence(lit(0), lit(3))).as("c"))
            .withColumn("chunk", expr("substring(s, c * 16 + 1, 16)")),
          HotKeyCap, "c", "chunk")
        val ham = aggregate(
          zip_with(split(col("s1"), ""), split(col("s2"), ""),
            (x, y) => when(x =!= y, 1).otherwise(0)),
          lit(0), (a, x) => a + x)
        // renamed-projection self-join (see minhashPairs' comment)
        val bSide = chunks.select(col("doc_id").as("d2"),
          col("c").as("c_b"), col("chunk").as("chunk_b"), col("s").as("s2"))
        chunks.join(bSide,
            col("c") === col("c_b") && col("chunk") === col("chunk_b")
              && col("doc_id") < col("d2"))
          .select(col("doc_id").as("d1"), col("d2"),
            col("s").as("s1"), col("s2"))
          .distinct()
          .withColumn("hamming", ham)
          .filter(col("hamming") <= 3)
          .select("d1", "d2", "hamming")
          .orderBy("d1", "d2")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |         unnest(list_distinct(string_split_regex(trim(lower(text)), '[ \t\n\f\r]+'))) AS tok
             |       FROM documents),
             |v AS (SELECT doc_id, b, sum(2*bit - 1) AS vote FROM (
             |        SELECT doc_id, bb.b AS b,
             |          CAST(floor((strpos('0123456789abcdef',
             |                             substr(md5(tok), (bb.b//4)+1, 1)) - 1)
             |                     / ([8,4,2,1][(bb.b%4)+1])) AS INT) % 2 AS bit
             |        FROM tok CROSS JOIN (SELECT unnest(generate_series(0,63)) AS b) bb) t
             |      GROUP BY 1,2),
             |sig AS (SELECT doc_id,
             |          string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END,
             |                     '' ORDER BY b) AS s
             |        FROM v GROUP BY doc_id),
             |ch AS (SELECT doc_id, s, c, substr(s, c*16+1, 16) AS chunk
             |       FROM sig CROSS JOIN (SELECT unnest(generate_series(0,3)) AS c) cc),
             |pr AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
             |         a.s AS s1, b.s AS s2
             |       FROM ch a JOIN ch b
             |         ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
             |h AS (SELECT d1, d2,
             |        CAST(list_sum(list_transform(generate_series(1,64),
             |          i -> CASE WHEN substr(s1,i,1) <> substr(s2,i,1)
             |               THEN 1 ELSE 0 END)) AS INT) AS hamming
             |      FROM pr)
             |SELECT d1, d2, hamming FROM h WHERE hamming <= 3
             |ORDER BY d1, d2""".stripMargin)),

    /* Index MAINTENANCE loop, oracle-gated: the full incremental-dedup
     * lifecycle — build the band index on history (bucket < 200), probe
     * ingest batch 1 ([200,230)), ADMIT it ([[BandIndex.append]]), then
     * probe batch 2 ([230,256)) against the grown index — emitted as one
     * frame (batch_no 1|2). The DuckDB oracle recomputes each phase
     * monolithically (phase 2's history = bucket < 230 exactly because
     * batch 1 was appended), so the hash gate proves the APPEND path —
     * bucket layout, per-side capping, join-back — not just the probe
     * that q78 gates. Batch 1's probe is eagerly checkpointed before the
     * append mutates the table (a lazy plan would read the post-append
     * files and see batch 1 as its own history). The scratch index is
     * rebuilt per run (pid-scoped name, overwrite) so the query stays
     * idempotent; the PERSISTED production index q78 reads is untouched.
     */
    QueryDef(
      "q87_index_maintenance",
      (s, dir) => {
        // pid-suffixed scratch (q112's discipline — two processes must
        // not interleave delete/saveAsTable on one scratch path), with
        // dead processes' abandoned trees reclaimed on entry
        val name = BandIndex.tableNameFor(dir) + "_maint_" +
          ProcessHandle.current().pid()
        val path = java.nio.file.Paths.get(BandIndex.indexRoot, name)
        IndexCommit.purgeAllScratchRoots()
        val base = docs(s, dir)
          .select(col("doc_id"), col("text"), col("lang"))
          .withColumn("bucket", BandIndex.ingestBucket)
        def slice(lo: Int, hi: Int) =
          base.filter(col("bucket") >= lo && col("bucket") < hi)
            .select("doc_id", "text")
        BandIndex.buildIndex(s, slice(0, 200), name, path)
        val p1 = BandIndex.probeIndex(s, name, slice(200, 230))
          .withColumn("batch_no", lit(1))
          .localCheckpoint(true)
        BandIndex.append(s, name, slice(200, 230))
        val p2 = BandIndex.probeIndex(s, name, slice(230, 256))
          .withColumn("batch_no", lit(2))
        p1.unionByName(p2).orderBy("batch_no", "doc_id")
      },
      {
        def phase(n: Int, histMax: Int, lo: Int, hi: Int): String =
          s"""hist$n AS (SELECT b.doc_id AS hist_id, b.band_idx, b.band_key
             |           FROM bands b JOIN bk ON bk.doc_id = b.doc_id
             |           WHERE bk.bucket < $histMax),
             |newb$n AS (SELECT b.doc_id, b.band_idx, b.band_key
             |           FROM bands b JOIN bk ON bk.doc_id = b.doc_id
             |           WHERE bk.bucket >= $lo AND bk.bucket < $hi),
             |hd$n AS (SELECT doc_id, count(*) AS n_hist_dups FROM (
             |           SELECT DISTINCT n.doc_id, h.hist_id
             |           FROM newb$n n JOIN hist$n h
             |             ON n.band_idx = h.band_idx AND n.band_key = h.band_key) t
             |         GROUP BY 1),
             |bd$n AS (SELECT doc_id, count(*) AS n_batch_dups FROM (
             |           SELECT DISTINCT a.doc_id, b.doc_id AS oid
             |           FROM newb$n a JOIN newb$n b
             |             ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             |                AND b.doc_id < a.doc_id) t
             |         GROUP BY 1),
             |p$n AS (SELECT k.doc_id,
             |          COALESCE(hd.n_hist_dups, 0) AS n_hist_dups,
             |          COALESCE(bd.n_batch_dups, 0) AS n_batch_dups,
             |          COALESCE(hd.n_hist_dups, 0) = 0
             |            AND COALESCE(bd.n_batch_dups, 0) = 0 AS admit,
             |          $n AS batch_no
             |        FROM bk k
             |        LEFT JOIN hd$n hd ON hd.doc_id = k.doc_id
             |        LEFT JOIN bd$n bd ON bd.doc_id = k.doc_id
             |        WHERE k.bucket >= $lo AND k.bucket < $hi)""".stripMargin
        Some("WITH " + pairsCte +
          """,
            |bk AS (SELECT doc_id,
            |         CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) AS bucket
            |       FROM documents),
            |""".stripMargin +
          phase(1, 200, 200, 230) + ",\n" + phase(2, 230, 230, 256) +
          """
            |SELECT * FROM p1 UNION ALL SELECT * FROM p2
            |ORDER BY batch_no, doc_id""".stripMargin)
      })
  )
}
