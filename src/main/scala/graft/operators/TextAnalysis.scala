package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables, Ws}

/** Text-analysis operators over the `documents` table: token counting,
  * language-ID (stopword-vote heuristic), quality scoring, and document
  * fingerprinting. These generalize the reference's normalization +
  * dictionary-scan core (`text_utils.py:49-65`, `tokenizer.py:897-1392`)
  * into the operators a large-scale training-data pipeline needs.
  *
  * Everything here is built from codegen'd built-ins (split / regexp /
  * higher-order array functions / md5) — no UDFs — so the whole stage stays
  * inside WholeStageCodegen and parallelizes embarrassingly (per-row, no
  * shuffle except final ordering).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Whitespace tokens of trimmed text (matches DuckDB string_split_regex).
    * Explicit ASCII class, not `\s` — see [[graft.core.Ws]]: Java and RE2
    * disagree on U+000B, so `\s` would quietly diverge from the oracle.
    */
  private val toks: Column = split(trim(col("text")), Ws.Plus)

  private def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")

  /** The distributed concat-and-chunk bin bookkeeping shared by q58
    * (text token costs) and q134 (multimodal token costs): a two-phase
    * prefix sum — per-block windowed cumsum over a (doc_id, n_tok)
    * frame + broadcast block offsets — NEVER a global-order
    * single-partition window. The offsets window is single-partition
    * BY DESIGN: it runs over the per-block totals (≤ #blocks rows),
    * never over the corpus. At cluster scale block sizing comes from
    * parquet column stats (max doc_id is a footer read, not a scan);
    * local[32] uses 32 blocks.
    */
  private def packBins(d: DataFrame, budget: Int): DataFrame = {
    val span = d.agg(max("doc_id")).head().getLong(0) + 1L
    val block = math.max(1L, (span + 31) / 32)
    val sized = d
      .withColumn("pid", (col("doc_id") / lit(block)).cast("long"))
      .repartition(col("pid"))
    val pw = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ow = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy("pid").agg(sum("n_tok").as("ptot"))
      .withColumn("poff", coalesce(sum("ptot").over(ow), lit(0L)))
      .select("pid", "poff")
    sized.join(broadcast(offsets), "pid")
      .withColumn("cum",
        coalesce(sum("n_tok").over(pw), lit(0L)) + col("poff"))
      .select(col("doc_id"), col("n_tok"),
        expr(s"cum div $budget").as("first_bin"),
        expr(s"(cum + n_tok - 1) div $budget").as("last_bin"),
        (col("cum") % budget).as("bin_offset"))
      .orderBy("doc_id")
  }

  // stopword-vote language markers: deliberately tiny dictionaries, one
  // regex scan per language in q31 (acceptable at 4 langs); q49 is the
  // broadcast-dictionary ONE-PASS form of the same computation, pinned
  // hit-for-hit equal by sharing q31's oracle.
  private val langs: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|in|to)\\b",
    "es" -> "\\b(el|la|de|los|las|que)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|les|des|et|est)\\b")

  /** Per-doc bigram-LM totals (doc_id, n_bigrams, lm_micro_nats) — the
    * add-1-smoothed corpus LM score shared by q73 (scoring) and q111
    * (filter apply). See q73's scaladoc for the micro-nat determinism
    * design and the scale shape.
    */
  private def bigramLmPerDoc(s: SparkSession, dir: String): DataFrame =
    bigramLmPerDocOf(docs(s, dir))

  /** [[bigramLmPerDoc]] over an arbitrary (doc_id, text) frame — the
    * corpus LM trained on a pipeline stage's SURVIVOR corpus
    * ([[CurationPipeline]]'s q115 trains it post-dedup/post-decontam,
    * on the spliced texts), identical scoring to the corpus queries.
    */
  private[operators] def bigramLmPerDocOf(d: DataFrame): DataFrame =
    lmScoreAgainst(d, lmModelOf(d))

  /** The corpus bigram LM as a FREEZABLE model: add-1-smoothed counts
    * (c12 per bigram, c1 per head word, vocab size) — the generation
    * artifact a continuous curation pipeline trains once on the history
    * corpus and scores every later batch against
    * ([[graft.streaming.CurationSink]]), exactly the frozen-centroids
    * discipline at the language-model layer.
    */
  private[graft] case class LmModel(c12: DataFrame, c1: DataFrame,
      vocab: DataFrame)

  private val LmWordRe = "[a-z0-9]+"

  private[graft] def lmWords(d: DataFrame): DataFrame = d
    .select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$LmWordRe', 0)").as("ws"))

  private[graft] def lmBigrams(d: DataFrame): DataFrame =
    lmWords(d)
      .filter(size(col("ws")) >= 2)
      .withColumn("h", slice(col("ws"), lit(1), size(col("ws")) - 1))
      .withColumn("t", slice(col("ws"), lit(2), size(col("ws")) - 1))
      .select(col("doc_id"), explode(arrays_zip(col("h"), col("t"))).as("bg"))
      .select(col("doc_id"), col("bg.h").as("w1"), col("bg.t").as("w2"))

  private[graft] def lmModelOf(d: DataFrame): LmModel = {
    val big = lmBigrams(d)
    LmModel(
      big.groupBy("w1", "w2").agg(count(lit(1)).as("c12")),
      big.groupBy("w1").agg(count(lit(1)).as("c1")),
      lmWords(d).select(explode(col("ws")).as("w"))
        .agg(countDistinct(col("w")).as("v")))
  }

  /** Per-doc add-1-smoothed totals of `d` scored against `model`.
    * In-corpus (model trained on `d` itself — q73/q111/q115) every
    * scored bigram exists in the model, so the left joins hit and this
    * is byte-identical to the pre-refactor inner-join form; against a
    * FROZEN model an unseen bigram scores ln((0+1)/(0+v)) and an unseen
    * head word contributes c1 = 0 — standard add-1 smoothing, the
    * streaming contract.
    */
  private[graft] def lmScoreAgainst(d: DataFrame, model: LmModel): DataFrame =
    lmBigrams(d)
      .join(model.c12, Seq("w1", "w2"), "left")
      .join(model.c1, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 1e6)
          .cast("long").as("mn"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("mn")).as("lm_micro_nats"))

  /** q73's oracle CTE prefix (words .. per_doc) — ONE constant shared
    * with q111 so the scoring the filter ranks on cannot drift from the
    * scoring q73 reports.
    */
  private[operators] def bigramLmCteOver(input: String): String =
    BigramLmCte.replace("FROM documents", "FROM " + input)

  /** q111's filter core over an arbitrary (doc_id, text) corpus: the
    * scored survivors (doc_id, n_bigrams, lm_micro_nats, avg_mn) at or
    * above the exact 20th-percentile micro-nat cutoff; unscorable docs
    * (no bigrams) drop. The Spark twin of [[LmFilterCtes]], shared by
    * q111 and q115.
    */
  private[operators] def lmFilterKeptOf(d: DataFrame): DataFrame = {
    val scored = bigramLmPerDocOf(d)
      .filter(col("n_bigrams") > 0)
      .withColumn("avg_mn", expr("lm_micro_nats div n_bigrams"))
    val cut = scored.agg(
      expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY avg_mn)").as("cut"))
    scored.crossJoin(broadcast(cut))
      .filter(col("avg_mn") >= col("cut"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_micro_nats"),
        col("avg_mn"))
  }

  /** q111's scored/cutoff CTE tail (integer micro-nat average, exact
    * 20th-percentile cutoff) — appended after a [[bigramLmCteOver]]
    * chain. Shared by q111 and q115.
    */
  private[operators] val LmFilterCtes: String =
    """,
      |scored AS (
      |  SELECT doc_id, n_bigrams, lm_micro_nats,
      |    lm_micro_nats // n_bigrams AS avg_mn
      |  FROM per_doc WHERE n_bigrams > 0),
      |cut AS (SELECT quantile_disc(avg_mn, 0.2) AS cut FROM scored)""".stripMargin

  /** q34's near-key fingerprint subquery (md5 of the first-5-token
    * prefix) over an arbitrary input relation. Shared by q34 and q115's
    * exact-dedup stage.
    */
  private[operators] def exactKeySelectOver(input: String): String =
    """SELECT doc_id,
      |        md5(array_to_string(string_split_regex(trim(text), '[ \t\n\f\r]+')[1:5], ' ')) AS key_fp
      |      FROM documents""".stripMargin
      .replace("FROM documents", "FROM " + input)

  /** q34's key fingerprint as a Column — the Spark twin of
    * [[exactKeySelectOver]]. */
  private[operators] def exactKeyCol: Column =
    md5(concat_ws(" ", slice(toks, 1, 5)))

  /** q57's deterministic source mixing weight (1..3 from the source id
    * suffix), Column + oracle forms. Shared by q57 and q115.
    */
  private[operators] def sourceWeightCol: Column =
    substring(col("source"), 4, 10).cast("int") % 3 + 1
  private[operators] val SourceWeightSql: String =
    "CAST(substr(source, 4) AS INT) % 3 + 1"

  private[operators] val BigramLmCte =
    """WITH words AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      |  FROM documents),
      |vocab AS (
      |  SELECT count(DISTINCT w) AS v
      |  FROM (SELECT unnest(ws) AS w FROM words)),
      |big AS (
      |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
      |  FROM (SELECT doc_id,
      |          unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS bg
      |        FROM words WHERE len(ws) >= 2)),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
      |per_doc AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    CAST(sum(CAST(round(ln(CAST(c12.c12 + 1 AS DOUBLE)
      |      / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000) AS BIGINT))
      |      AS BIGINT) AS lm_micro_nats
      |  FROM big b
      |  JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab v
      |  GROUP BY 1)""".stripMargin

  /** The FROZEN-model oracle half of [[lmModelOf]]: add-1 bigram model
    * counts (hc12/hc1) and vocab size (hv) trained over `histRel` —
    * the q73 formula verbatim, only the relation and CTE names changed
    * so a maintenance oracle can train on a history slice and score
    * batches separately ([[graft.streaming.CurationSink]]'s artifact
    * discipline, gated by q118).
    */
  private[operators] def lmModelCtes(histRel: String): String =
    s"""hw AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM $histRel),
       |hv AS (
       |  SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(ws) AS w FROM hw)),
       |hbig AS (
       |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
       |  FROM (SELECT doc_id,
       |          unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS bg
       |        FROM hw WHERE len(ws) >= 2)),
       |hc12 AS (SELECT w1, w2, count(*) AS c12 FROM hbig GROUP BY 1, 2),
       |hc1 AS (SELECT w1, count(*) AS c1 FROM hbig GROUP BY 1)""".stripMargin

  /** Per-doc add-1 totals of `rel` (doc_id, text) scored against the
    * [[lmModelCtes]] model — [[lmScoreAgainst]]'s oracle twin: LEFT
    * joins with coalesce-to-0 counts, so an unseen bigram scores
    * ln((0+1)/(0+v)), the streaming add-1 contract. CTE names suffixed
    * per instantiation (history cutoff + one per maintenance phase).
    */
  private[operators] def lmScoreCtes(rel: String, sfx: String): String =
    s"""bw$sfx AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM $rel),
       |bbig$sfx AS (
       |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
       |  FROM (SELECT doc_id,
       |          unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS bg
       |        FROM bw$sfx WHERE len(ws) >= 2)),
       |pd$sfx AS (
       |  SELECT b.doc_id, count(*) AS n_bigrams,
       |    CAST(sum(CAST(round(ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE)
       |      / CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE)) * 1000000) AS BIGINT))
       |      AS BIGINT) AS lm_micro_nats
       |  FROM bbig$sfx b
       |  LEFT JOIN hc12 c12 USING (w1, w2) LEFT JOIN hc1 c1 USING (w1)
       |  CROSS JOIN hv v
       |  GROUP BY 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting (whitespace tokenizer; the BPE-ish regex
    //      variant is q47 below)
    QueryDef(
      "q30_token_count",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), col("n_chars"), size(toks).as("n_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars,
             |  len(string_split_regex(trim(text), '[ \t\n\f\r]+')) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- BPE-ish token counting: a GPT-family pre-tokenizer approximated
    //      in the RE2-compatible subset (no lookahead) so Spark's Java
    //      regex and DuckDB's RE2 agree token-for-token — contraction
    //      suffixes, letter runs, digit runs capped at 3 (the modern BPE
    //      number-splitting convention), punctuation runs. Both engines
    //      use leftmost-first alternation, so the pattern is portable.
    //      `fertility` (BPE tokens per whitespace word) is the standard
    //      budget-estimation signal this count exists to feed.
    QueryDef(
      "q47_bpe_token_count",
      (s, dir) => {
        // explicit ASCII whitespace in the negated class (not \s): Java
        // counts U+000B as \s, RE2 does not — Ws.InClass pins both engines
        val bpeRe =
          s"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9${Ws.InClass}]+"
        docs(s, dir)
          .select(col("doc_id"),
            size(toks).as("n_ws_tokens"),
            size(regexp_extract_all(col("text"), lit(bpeRe), lit(0)))
              .as("n_bpe_tokens"))
          .withColumn("fertility",
            when(col("n_ws_tokens") > 0,
              ratio(col("n_bpe_tokens"), col("n_ws_tokens")))
              .otherwise(lit(0.0)))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_ws_tokens, n_bpe_tokens,
             |  CASE WHEN n_ws_tokens > 0
             |       THEN CAST(n_bpe_tokens AS DOUBLE) / CAST(n_ws_tokens AS DOUBLE)
             |       ELSE 0.0 END AS fertility
             |FROM (SELECT doc_id,
             |        len(string_split_regex(trim(text), '[ \t\n\f\r]+')) AS n_ws_tokens,
             |        CAST(len(regexp_extract_all(text,
             |          '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 \t\n\f\r]+')) AS INT) AS n_bpe_tokens
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- language-ID: per-language stopword hit counts + argmax vote
    QueryDef(
      "q31_lang_id",
      (s, dir) => {
        val low = lower(col("text"))
        val withVotes = langs.foldLeft(docs(s, dir))((df, lp) =>
          df.withColumn(s"${lp._1}_hits", size(regexp_extract_all(low, lit(lp._2), lit(0)))))
        val Seq(en, es, de, fr) = langs.map(l => col(s"${l._1}_hits"))
        withVotes
          .withColumn("lang_guess",
            when(en >= es && en >= de && en >= fr && en > 0, "en")
              .when(es >= de && es >= fr && es > 0, "es")
              .when(de >= fr && de > 0, "de")
              .when(fr > 0, "fr")
              .otherwise("und"))
          .select("doc_id", "en_hits", "es_hits", "de_hits", "fr_hits", "lang_guess", "lang")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
             |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
             |       WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es'
             |       WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
             |       WHEN fr_hits > 0 THEN 'fr'
             |       ELSE 'und' END AS lang_guess,
             |  lang
             |FROM (SELECT doc_id, lang,
             |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS en_hits,
             |    len(regexp_extract_all(lower(text), '\b(el|la|de|los|las|que)\b')) AS es_hits,
             |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS de_hits,
             |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|est)\b')) AS fr_hits
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- language-ID, broadcast-dictionary ONE-PASS form: the scale
    //      path q31's scaladoc names. q31 runs one full-text regex scan
    //      per language (fine at 4, linear-in-languages); here tokens
    //      explode ONCE and join a broadcast (word -> lang) dict, so
    //      cost is one scan + one aggregation regardless of how many
    //      languages the dict holds. Tokens split on [^a-z0-9_]+ —
    //      exactly the complement of regex \w — so a letter-run token
    //      equals a \b-delimited match and the two formulations are
    //      provably hit-for-hit identical: the oracle is the SAME SQL
    //      as q31's regex-count oracle, making the equivalence
    //      machine-checked rather than asserted.
    QueryDef(
      "q49_lang_id_onepass",
      (s, dir) => {
        import s.implicits._
        val dict = langs.flatMap { case (l, re) =>
          re.stripPrefix("\\b(").stripSuffix(")\\b").split("\\|").map(w => (w, l))
        }.toDF("tok", "dict_lang")
        val toksDf = docs(s, dir)
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z0-9_]+")).as("tok"))
        val counts = toksDf.join(broadcast(dict), "tok")
          .groupBy("doc_id")
          .pivot("dict_lang", langs.map(_._1))
          .count()
        val hits = docs(s, dir).select("doc_id", "lang")
          .join(counts, Seq("doc_id"), "left")
          .select(col("doc_id") +: col("lang") +: langs.map(l =>
            coalesce(col(l._1), lit(0L)).cast("int").as(s"${l._1}_hits")): _*)
        val Seq(en, es, de, fr) = langs.map(l => col(s"${l._1}_hits"))
        hits
          .withColumn("lang_guess",
            when(en >= es && en >= de && en >= fr && en > 0, "en")
              .when(es >= de && es >= fr && es > 0, "es")
              .when(de >= fr && de > 0, "de")
              .when(fr > 0, "fr")
              .otherwise("und"))
          .select("doc_id", "en_hits", "es_hits", "de_hits", "fr_hits", "lang_guess", "lang")
          .orderBy("doc_id")
      },
      // IDENTICAL oracle to q31: the one-pass join must reproduce the
      // per-language regex counts exactly
      Some("""SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
             |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
             |       WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es'
             |       WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
             |       WHEN fr_hits > 0 THEN 'fr'
             |       ELSE 'und' END AS lang_guess,
             |  lang
             |FROM (SELECT doc_id, lang,
             |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS en_hits,
             |    len(regexp_extract_all(lower(text), '\b(el|la|de|los|las|que)\b')) AS es_hits,
             |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS de_hits,
             |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|est)\b')) AS fr_hits
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring: length / stopword-ratio / mean token length
    QueryDef(
      "q32_quality_score",
      (s, dir) => {
        val lowToks = split(trim(lower(col("text"))), Ws.Plus)
        docs(s, dir)
          .select(
            col("doc_id"),
            size(lowToks).as("n_tokens"),
            aggregate(transform(lowToks, t => length(t)), lit(0), (a, x) => a + x)
              .cast("long").as("sum_tok_len"),
            size(filter(lowToks, t =>
              t === "the" || t === "a" || t === "and" || t === "of" || t === "in"))
              .as("n_stop"),
            length(regexp_replace(col("text"), "[^a-zA-Z]", "")).as("n_alpha"),
            length(col("text")).as("len_chars"))
          .withColumn("mean_tok_len", ratio(col("sum_tok_len"), col("n_tokens")))
          .withColumn("stop_ratio", ratio(col("n_stop"), col("n_tokens")))
          .withColumn("alpha_ratio", ratio(col("n_alpha"), col("len_chars")))
          .withColumn("quality",
            when(col("stop_ratio") >= 0.08, "stopword_heavy")
              .when(col("mean_tok_len") >= 4.5, "long_tokens")
              .otherwise("ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_tokens, sum_tok_len, n_stop, n_alpha, len_chars,
             |  CAST(sum_tok_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS mean_tok_len,
             |  CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS stop_ratio,
             |  CAST(n_alpha AS DOUBLE)/CAST(len_chars AS DOUBLE) AS alpha_ratio,
             |  CASE WHEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= 0.08 THEN 'stopword_heavy'
             |       WHEN CAST(sum_tok_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= 4.5 THEN 'long_tokens'
             |       ELSE 'ok' END AS quality
             |FROM (SELECT doc_id,
             |    len(string_split_regex(trim(lower(text)), '[ \t\n\f\r]+')) AS n_tokens,
             |    CAST(list_sum(list_transform(string_split_regex(trim(lower(text)), '[ \t\n\f\r]+'),
             |                                 t -> len(t))) AS BIGINT) AS sum_tok_len,
             |    len(list_filter(string_split_regex(trim(lower(text)), '[ \t\n\f\r]+'),
             |        t -> t = 'the' OR t = 'a' OR t = 'and' OR t = 'of' OR t = 'in')) AS n_stop,
             |    len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
             |    len(text) AS len_chars
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- document fingerprint: md5 of canonical normalized text
    //      (normalization mirrors _normalize_text_basic, text_utils.py:40-45)
    QueryDef(
      "q33_fingerprint",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- textlib-UDF normalization (F2) checked against the SQL oracle:
    //      proves the Scala UDF row path produces byte-identical output to
    //      the declarative regexp chain (match_labs.py:18-26 semantics)
    QueryDef(
      "q38_udf_normalize",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"),
            graft.functions.GraftFunctions.normalizeBasic(col("text")).as("norm"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- exact near-key dedup groups: fingerprint on leading-token prefix,
    //      hash-groupBy (dedup-before-compute pattern, tagger.py:436-441)
    QueryDef(
      "q34_exact_dedup",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), exactKeyCol.as("key_fp"))
          .groupBy("key_fp")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .orderBy("key_fp"),
      Some("SELECT key_fp, count(*) AS n_docs, min(doc_id) AS first_doc\n" +
        "FROM (" + exactKeySelectOver("documents") + ") t\n" +
        "GROUP BY 1 ORDER BY 1")),

    // ---- deterministic hash-split train/eval assignment: the standard
    //      training-data split at 100 TB is a pure per-row hash of the
    //      stable key — reproducible across engines and re-runs, no
    //      sample() RNG, no shuffle, no coordination. md5 is the shared
    //      engine-identical hash; the first two hex chars give a uniform
    //      0..255 bucket, split 80/20 at 0xCC (204/256 = 79.7% train).
    //      Stratification comes free by keying the hash on (lang, doc_id)
    //      so each language splits independently at the same rate.
    QueryDef(
      "q44_train_split",
      (s, dir) => {
        // coalesce: concat_ws SKIPS nulls while the oracle's || propagates
        // them through md5 — a null-lang row would split differently per
        // engine without pinning both sides to the empty string
        val bucket = conv(
          substring(md5(concat_ws(":", coalesce(col("lang"), lit("")), col("doc_id"))), 1, 2),
          16, 10).cast("int")
        docs(s, dir)
          .select(col("doc_id"), col("lang"),
            when(bucket < 204, lit("train")).otherwise(lit("eval")).as("split"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN CAST('0x' || substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) < 204
             |       THEN 'train' ELSE 'eval' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- stratified resampling: rebalance the language mix by
    //      downsampling the dominant language to 25% while keeping the
    //      rest whole — the corpus-rebalancing step before training. A
    //      SALTED md5 bucket ("smp:" prefix) keeps this draw independent
    //      of q44's split buckets; the whole query is a deterministic
    //      map-side filter — no shuffle, no RNG, no coordination, and
    //      re-runs (or retried tasks on a cluster) select identical rows.
    QueryDef(
      "q54_stratified_sample",
      (s, dir) => {
        val bucket = conv(
          substring(md5(concat_ws(":", lit("smp"),
            coalesce(col("lang"), lit("")), col("doc_id"))), 1, 2),
          16, 10).cast("int")
        // null lang falls into the ELSE (keep-whole) branch on both sides
        docs(s, dir)
          .select(col("doc_id"), col("lang"), bucket.as("bucket"))
          .filter(col("bucket") <
            when(col("lang") === "en", lit(64)).otherwise(lit(256)))
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    CAST('0x' || substr(md5('smp:' || coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS INT) AS bucket
             |  FROM documents) x
             |WHERE bucket < CASE WHEN lang = 'en' THEN 64 ELSE 256 END
             |ORDER BY doc_id""".stripMargin)),

    // ---- corpus mixing by source weight: upsample each source to its
    //      mixing weight (docs from weight-w sources are seen w times
    //      per training pass) — the complement of q54's downsampling.
    //      Weights derive deterministically from the source id here
    //      (suffix mod 3 + 1, i.e. 1..3); production supplies a weight
    //      table, the shape is the same. A generator explode multiplies
    //      rows by the bounded weight — no shuffle, no join.
    QueryDef(
      "q57_source_mix",
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"), col("source"), sourceWeightCol.as("weight"))
          .select(col("doc_id"), col("source"), col("weight"),
            explode(sequence(lit(1), col("weight"))).as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some("SELECT doc_id, source, weight,\n" +
        "  unnest(generate_series(1, weight)) AS epoch\n" +
        s"FROM (SELECT doc_id, source,\n        $SourceWeightSql AS weight\n" +
        "      FROM documents) x\nORDER BY doc_id, epoch")),

    // ---- document chunking: fixed-size token windows with stride (the
    //      pre-training chunk step — sequence-length-bounded windows
    //      with overlap so no boundary context is lost). Window size 8,
    //      stride 6 (overlap 2). One generator explode per doc, chunk
    //      text via slice — no shuffle before the output sort, and the
    //      explode multiplies rows by ~len/stride, not len.
    QueryDef(
      "q55_chunking",
      (s, dir) => {
        docs(s, dir)
          .filter(trim(col("text")) =!= "")
          .select(col("doc_id"), toks.as("t"))
          .select(col("doc_id"), col("t"),
            posexplode(sequence(lit(1), size(col("t")), lit(6)))
              .as(Seq("chunk_idx", "start")))
          .select(col("doc_id"), col("chunk_idx"),
            least(lit(8), size(col("t")) - col("start") + 1).as("n_tok"),
            array_join(slice(col("t"), col("start"), lit(8)), " ").as("chunk"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH d AS (SELECT doc_id,
             |         string_split_regex(trim(text), '[ \t\n\f\r]+') AS t
             |       FROM documents WHERE trim(text) <> ''),
             |e AS (SELECT doc_id, t,
             |        unnest(generate_series(1, len(t), 6)) AS s FROM d)
             |SELECT doc_id, CAST((s-1)/6 AS INT) AS chunk_idx,
             |  CAST(least(8, len(t) - s + 1) AS INT) AS n_tok,
             |  array_to_string(t[s:least(s+7, len(t))], ' ') AS chunk
             |FROM e ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- sequence packing: concat-and-chunk bookkeeping for fixed
    //      context-length training sequences (budget 16 tokens). In
    //      doc_id order every doc's tokens occupy the global offset
    //      range [cum, cum+n); the output says which packed sequence
    //      (bin) a doc starts and ends in and where inside its first
    //      bin — the step after q55 that turns chunks into training
    //      sequences with no padding waste. The global running sum is
    //      a DISTRIBUTED two-phase prefix sum: an order-preserving
    //      block id derived from doc_id, a per-block window for the
    //      local cumsum, and a tiny per-block offset frame (≤ #blocks
    //      rows) broadcast back. The naive `Window.orderBy(doc_id)`
    //      with no partitionBy would collapse the whole corpus into
    //      ONE task — the single-partition-window anti-pattern this
    //      query exists to avoid (OperatorSpec pins the two forms
    //      equal and the plan shape partitioned). At cluster scale
    //      block sizing comes from parquet column stats (max doc_id
    //      is a footer read, not a scan); local[32] uses 32 blocks.
    QueryDef(
      "q58_sequence_pack",
      (s, dir) => packBins(
        docs(s, dir)
          .filter(trim(col("text")) =!= "")
          .select(col("doc_id"), size(toks).as("n_tok")),
        budget = 16),
      Some("""WITH d AS (SELECT doc_id,
             |        len(string_split_regex(trim(text), '[ \t\n\f\r]+')) AS n_tok
             |      FROM documents WHERE trim(text) <> ''),
             |c AS (SELECT doc_id, n_tok,
             |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
             |      FROM d)
             |SELECT doc_id, n_tok,
             |  cum // 16 AS first_bin,
             |  (cum + n_tok - 1) // 16 AS last_bin,
             |  cum % 16 AS bin_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- repetition scoring: duplicate word-trigram fraction per doc
    //      (the Gopher-family quality signal — boilerplate/spam shows up
    //      as repeated n-grams). Pure per-row array algebra, no shuffle.
    QueryDef(
      "q45_repetition",
      (s, dir) => {
        // non-distinct trigrams via the same shifted-slice zip_with shape
        // as Dedup.shinglesOf (lambda-argument-only, no inlined regex)
        val t = toks
        val tri = filter(
          zip_with(
            zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
              (a, b) => concat(a, lit(" "), b)),
            slice(t, lit(3), greatest(size(t) - 2, lit(0))),
            (ab, c) => concat(ab, lit(" "), c)),
          x => x.isNotNull)
        docs(s, dir)
          .select(col("doc_id"), tri.as("tri"))
          .select(col("doc_id"),
            size(col("tri")).as("n_tri"),
            (size(col("tri")) - size(array_distinct(col("tri")))).as("n_dup"))
          .withColumn("dup_frac",
            when(col("n_tri") > 0,
              col("n_dup").cast("double") / col("n_tri").cast("double"))
              .otherwise(lit(0.0)))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_tri, n_dup,
             |  CASE WHEN n_tri > 0
             |       THEN CAST(n_dup AS DOUBLE) / CAST(n_tri AS DOUBLE)
             |       ELSE 0.0 END AS dup_frac
             |FROM (SELECT doc_id,
             |        len(tri) AS n_tri,
             |        len(tri) - len(list_distinct(tri)) AS n_dup
             |      FROM (SELECT doc_id,
             |              CASE WHEN len(t) >= 3
             |                   THEN list_transform(generate_series(1, len(t)-2),
             |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             |                   ELSE [] END AS tri
             |            FROM (SELECT doc_id,
             |                    string_split_regex(trim(text), '[ \t\n\f\r]+') AS t
             |                  FROM documents) x) y) z
             |ORDER BY doc_id""".stripMargin)),

    // ---- PII scrubbing: email + long-digit-run redaction with match
    //      counts. The corpus carries no organic PII, so a deterministic
    //      pii-bearing suffix is appended IN the query (identically in
    //      both engines) — the redaction regexes provably fire on every
    //      row instead of no-op'ing. Patterns stay in the RE2-compatible
    //      subset so Spark (Java regex) and DuckDB (RE2) agree.
    QueryDef(
      "q46_pii_scrub",
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val numRe = "[0-9]{7,}"
        val withPii = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com ref "),
          (col("doc_id") + 1) * 1234567)
        docs(s, dir)
          .select(col("doc_id"), withPii.as("raw"))
          .select(col("doc_id"),
            regexp_count(col("raw"), lit(emailRe)).as("n_email"),
            regexp_count(col("raw"), lit(numRe)).as("n_num"),
            regexp_replace(
              regexp_replace(col("raw"), emailRe, "<EMAIL>"),
              numRe, "<NUM>").as("scrubbed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
             |  CAST(len(regexp_extract_all(raw, '[0-9]{7,}')) AS INT) AS n_num,
             |  regexp_replace(
             |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '[0-9]{7,}', '<NUM>', 'g') AS scrubbed
             |FROM (SELECT doc_id,
             |        text || ' contact user' || CAST(doc_id AS VARCHAR)
             |             || '@example.com ref '
             |             || CAST((doc_id + 1) * 1234567 AS VARCHAR) AS raw
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    /* Vocabulary induction + OOV coverage — the "train the tokenizer on
     * the corpus, then measure what it misses" loop. The vocab is the
     * top-V words by (count DESC, word ASC) — a TOTAL order, so the
     * boundary of the vocab is deterministic on both engines (plain
     * the un-keyed sort+LIMIT would tie-break arbitrarily). Per doc:
     * token count and out-of-vocab count. Scale shape: the token explode
     * is map-side; the top-V selection is sort+limit, which Spark plans
     * as TakeOrderedAndProject (per-partition partial top-V, V rows per
     * partition merged — NEVER a global-order single-partition window,
     * the q58 anti-pattern); the vocab is bounded (V=20 — below the synthetic corpus's 31
     * distinct words, so the OOV path is exercised) by
     * CONSTRUCTION so its membership probe rides a broadcast left join;
     * the per-doc re-agg shuffles on doc_id once.
     */
    QueryDef(
      "q69_vocab_coverage",
      (s, dir) => {
        val v = 20
        val words = docs(s, dir)
          .select(col("doc_id"), explode(toks).as("word"))
        val vocab = words.groupBy("word").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(v)
          .select(col("word"), lit(1).as("in_vocab"))
        words
          .join(broadcast(vocab), Seq("word"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            count(when(col("in_vocab").isNull, 1)).as("n_oov"))
          .orderBy("doc_id")
      },
      Some("""WITH words AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(trim(text), '[ \t\n\f\r]+')) AS word
             |  FROM documents),
             |vocab AS (
             |  SELECT word FROM (
             |    SELECT word, row_number() OVER (
             |      ORDER BY count(*) DESC, word) AS vrank
             |    FROM words GROUP BY word) t
             |  WHERE vrank <= 20)
             |SELECT w.doc_id, count(*) AS n_tokens,
             |  count(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov
             |FROM words w LEFT JOIN vocab v ON w.word = v.word
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    /* Bigram language-model quality scoring — the CCNet-style "score
     * each document under a corpus-trained LM" filter (the reference's
     * scoring cascade generalized to probabilistic text quality;
     * cf. Wenzek et al., CCNet). Train: add-1-smoothed bigram model over
     * the whole corpus (C(w1,w2), context counts C(w1), vocabulary V).
     * Score: per-doc mean log-probability.
     *
     * Cross-engine float determinism: a sum of doubles is shuffle-order-
     * dependent, so the per-bigram log-prob is ROUNDED TO INTEGER
     * MICRO-NATS first (round(ln(P)*1e6) AS BIGINT — Spark HALF_UP and
     * DuckDB round() are both half-away-from-zero) and the per-doc
     * aggregation sums exact integers, which is order-independent. Each
     * P = (c12+1)/(c1+V) is a division of exact integers — bit-identical
     * on both engines; ln() is the only implementation-defined step and
     * its ulp-level variance is absorbed by the 1e-9-relative rounding
     * margin. The float avg_logprob is derived from the integer sum by
     * two deterministic divisions.
     *
     * Scale shape: the bigram explode is map-side (arrays_zip of two
     * slices — no self-join on position); C(w1,w2) and the join back to
     * the bigram stream hash-partition on the same key so the exchange
     * is reused; C(w1) adds the one extra shuffle an LM train genuinely
     * needs; V rides a 1-row broadcast. At 100 TB the count tables are
     * vocabulary-sized (corpus-sublinear) and the token stream is never
     * collected — the same plan a bucketed-by-w1 production train would
     * use.
     */
    QueryDef(
      "q73_bigram_lm",
      (s, dir) => {
        docs(s, dir).select(col("doc_id"))
          .join(bigramLmPerDoc(s, dir), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("lm_micro_nats"), lit(0L)).as("lm_micro_nats"),
            when(col("n_bigrams") > 0,
              col("lm_micro_nats").cast("double") / 1000000.0 /
                col("n_bigrams").cast("double")).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some(BigramLmCte + """
             |SELECT d.doc_id,
             |  CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  CAST(coalesce(p.lm_micro_nats, 0) AS BIGINT) AS lm_micro_nats,
             |  CASE WHEN p.n_bigrams > 0
             |       THEN CAST(p.lm_micro_nats AS DOUBLE) / 1000000.0
             |            / CAST(p.n_bigrams AS DOUBLE)
             |       ELSE NULL END AS avg_logprob
             |FROM documents d LEFT JOIN per_doc p USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    /* LM-quality filter APPLY — the q73 detect -> apply completion (the
     * q53->q105 / q107->q108 discipline): the post-filter training
     * corpus under the CCNet-style rule "drop the worst-scoring 20% by
     * corpus-LM probability" (Wenzek et al., CCNet — there with wiki-LM
     * perplexity buckets; here the corpus-trained q73 bigram LM).
     *
     * Determinism: the rank metric is integer micro-nats per bigram
     * (lm_micro_nats div n_bigrams — integer division, exact on both
     * engines); the cutoff is percentile_disc(0.2) over those integers
     * (an actual data value, no interpolation — the q65 contract) and
     * the gate is >= cutoff, so kept-set membership is exact. Docs with
     * no bigrams are unscorable and dropped, stated rather than
     * defaulted. Scale shape: everything up to per_doc is q73's plan;
     * the percentile runs over DOC-level rows (corpus-sublinear) and
     * the cutoff rides a 1-row broadcast back onto the scored frame —
     * at a doc count where even doc-level exact percentile hurts, q70's
     * approx_percentile twin is the documented fallback.
     */
    QueryDef(
      "q111_lm_filter_apply",
      (s, dir) => lmFilterKeptOf(docs(s, dir)).orderBy("doc_id"),
      Some(BigramLmCte + LmFilterCtes +
        """
          |SELECT s.doc_id, s.n_bigrams, s.lm_micro_nats, s.avg_mn
          |FROM scored s CROSS JOIN cut c
          |WHERE s.avg_mn >= c.cut
          |ORDER BY s.doc_id""".stripMargin)),

    /* TF-IDF salient-term extraction — top-3 terms per document by
     * tf × smooth-idf (sklearn convention: idf = ln((N+1)/(df+1)) + 1),
     * the classic corpus-relative keyword signal a curation pipeline
     * uses for topic tagging and near-duplicate triage.
     *
     * Determinism: idf is rounded to integer micro-nats ONCE per term
     * (the only transcendental), so score = tf * idf_micro is exact
     * integer arithmetic and the per-doc ranking is a TOTAL order
     * (score DESC, term ASC) — no float comparison anywhere in the
     * ranking path on either engine.
     *
     * Scale shape: tf is one shuffle on (doc_id, term); df reuses the tf
     * frame (one count per (doc,term) row) so it is vocabulary-sized and
     * corpus-sublinear; the df table joins back on term (hash join —
     * broadcastable when the vocab is bounded, left as a shuffle join
     * because a 100-TB vocabulary is not); N rides a 1-row broadcast;
     * the final top-3 window partitions by doc_id (per-doc cardinality
     * is bounded by distinct-words-per-doc, no skew hazard).
     */
    QueryDef(
      "q74_tfidf",
      (s, dir) => {
        val wordRe = "[a-z0-9]+"
        val tf = docs(s, dir)
          .select(col("doc_id"),
            explode(expr(s"regexp_extract_all(lower(text), '$wordRe', 0)"))
              .as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
        val scored = tf
          .join(dfreq, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            (col("tf") *
              round((log((col("n_docs") + 1).cast("double") /
                (col("df") + 1).cast("double")) + 1.0) * 1e6)
                .cast("long")).as("score_micro"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score_micro").desc, col("term"))
        scored
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score_micro"), col("rk"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
             |  FROM documents),
             |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
             |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT t.doc_id, t.term, t.tf, d.df,
             |    t.tf * CAST(round((ln(CAST(n.n_docs + 1 AS DOUBLE)
             |      / CAST(d.df + 1 AS DOUBLE)) + 1.0) * 1000000) AS BIGINT)
             |      AS score_micro
             |  FROM tfc t JOIN dfc d USING (term) CROSS JOIN n)
             |SELECT doc_id, term, tf, df, score_micro, rk
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rk
             |      FROM scored) r
             |WHERE rk <= 3
             |ORDER BY doc_id, rk""".stripMargin)),

    // ---- q120: line-level boilerplate extraction over markup-bearing
    //      text — the curation stage every real pretraining pipeline
    //      runs BEFORE dedup/decontam/quality (jusText rule shape;
    //      Pomikálek 2011). The corpus text is already clean, so the
    //      query CONSTRUCTS a deterministic HTML-ish fixture per doc
    //      (title/nav/content/inline-link/shout/code/footer lines) from
    //      the SAME SQL text both engines evaluate, then runs the
    //      native expression; the oracle replays the line algebra
    //      through [[boilerplateCtes]], which interpolates the
    //      expression's own public threshold constants — rule drift
    //      flips the hash. Per-row, map-side, codegen'd: the only
    //      exchange is the output ordering.
    QueryDef(
      "q120_boilerplate_extract",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        docs(s, dir)
          .withColumn("markup", expr(BoilerplateFixtureSql))
          .select(col("doc_id"),
            call_function("graft_boilerplate_clean", col("markup")).as("c"))
          .select(col("doc_id"), col("c.clean_text"), col("c.n_lines"),
            col("c.n_kept"), col("c.n_short"), col("c.n_link"),
            col("c.n_stop"))
          .orderBy("doc_id")
      },
      Some(s"""WITH bp_m AS (
             |  SELECT doc_id, $BoilerplateFixtureSql AS markup FROM documents),
             |${boilerplateCtes("bp_m", "markup", "")}
             |SELECT doc_id, clean_text, n_lines, n_kept, n_short, n_link, n_stop
             |FROM bp_docs ORDER BY doc_id""".stripMargin)),

    /* MULTIMODAL sequence packing — q58's distributed two-phase
     * prefix sum over the token cost of INTERLEAVED multimodal
     * samples: a doc's context-window footprint is its text tokens
     * plus a FIXED per-modality token budget for each attachment it
     * carries (the vision-token model: an image maps to a constant
     * number of patch tokens regardless of content — the LLaVA/
     * Flamingo batching rule — here 64/32/128 for image/audio/video
     * under q133's arrival moduli). Budget 512 so bins hold a few
     * mixed samples. ONE packing body with q58 ([[packBins]]) — the
     * bookkeeping cannot drift between the text and multimodal
     * forms; only the cost column differs, and the oracle states the
     * same cost arithmetic inline.
     */
    QueryDef(
      "q134_multimodal_pack",
      (s, dir) => packBins(
        docs(s, dir)
          .filter(trim(col("text")) =!= "")
          .select(col("doc_id"),
            (size(toks) +
              when(col("doc_id") % 3 === 0, 64).otherwise(0) +
              when(col("doc_id") % 4 === 1, 32).otherwise(0) +
              when(col("doc_id") % 5 === 2, 128).otherwise(0)).as("n_tok")),
        budget = 512),
      Some("""WITH d AS (SELECT doc_id,
             |        CAST(len(string_split_regex(trim(text), '[ \t\n\f\r]+'))
             |          + CASE WHEN doc_id % 3 = 0 THEN 64 ELSE 0 END
             |          + CASE WHEN doc_id % 4 = 1 THEN 32 ELSE 0 END
             |          + CASE WHEN doc_id % 5 = 2 THEN 128 ELSE 0 END AS INT) AS n_tok
             |      FROM documents WHERE trim(text) <> ''),
             |c AS (SELECT doc_id, n_tok,
             |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
             |      FROM d)
             |SELECT doc_id, n_tok,
             |  cum // 512 AS first_bin,
             |  (cum + n_tok - 1) // 512 AS last_bin,
             |  cum % 512 AS bin_offset
             |FROM c ORDER BY doc_id""".stripMargin))
  )

  /** q120's markup fixture — ONE SQL text evaluated verbatim by BOTH
    * engines over `documents` (doc_id, text), so the fixture cannot
    * drift between the query and its oracle. Seven '\n'-joined lines
    * per doc chosen to exercise every verdict class: pure-markup title
    * (strips short), nav + footer link bars (link-dense), a <p> content
    * line (keeps), a doc_id-varied content slice with an inline anchor
    * (keeps / drops by the doc's own lengths), a short bold shout
    * (short), and a stopword-free code line (stop). Restricted to the
    * SQL dialect intersection: ||, chr(10), substr, upper,
    * CAST(.. AS STRING/INT) — all identical in Spark and DuckDB.
    */
  def BoilerplateFixtureSql: String =
    """'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title></head>' || chr(10) ||
      |'<a href="/home">Home</a> | <a href="/about">About us</a> | <a href="/contact">Contact</a>' || chr(10) ||
      |'<p>' || substr(text, 1, 160) || '</p>' || chr(10) ||
      |substr(text, 90, 60 + CAST(doc_id % 90 AS INT)) || ' <a href="/ref">see reference ' || CAST(doc_id % 10 AS STRING) || '</a> end.' || chr(10) ||
      |'<b>' || upper(substr(text, 1, 12)) || '</b>' || chr(10) ||
      |'var_' || CAST(doc_id % 7 AS STRING) || ' := hash_join(scan_' || CAST(doc_id % 5 AS STRING) || ', probe); emit(out_row); flush_partition_buffers()' || chr(10) ||
      |'<a href="/privacy">Privacy policy</a> | <a href="/terms">Terms of use</a>'"""
      .stripMargin.replace("\n", " ")

  /** The capstone's markup ARRIVAL wrap (q115 s0m): one in five docs
    * reaches ingest as an HTML-ish page — title, nav bar, the doc's
    * ORIGINAL text as the page's content line, footer. Extraction
    * strips the boilerplate and recovers the content line EXACTLY
    * (corpus text is single-line and pre-trimmed, so stripped ≡
    * original — the property that lets s3 keep serving the PERSISTED
    * FpIndex, whose fingerprints were computed over the original
    * texts; [[graft.operators.CurationPipeline]] documents the
    * contract, CurationPipelineSpec pins it on an engineered corpus).
    * ONE SQL text for both engines, the [[BoilerplateFixtureSql]]
    * discipline.
    */
  def BoilerplateWrapSql: String =
    """'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title></head>' || chr(10) ||
      |'<a href="/home">Home</a> | <a href="/about">About us</a> | <a href="/contact">Contact</a>' || chr(10) ||
      |'<p>' || text || '</p>' || chr(10) ||
      |'<a href="/privacy">Privacy policy</a> | <a href="/terms">Terms of use</a>'"""
      .stripMargin.replace("\n", " ")

  /** The q120 line algebra as reusable DuckDB CTE text — the oracle
    * twin of [[graft.expressions.BoilerplateClean.compute]], generated
    * from the expression's OWN public constants (thresholds, stopword
    * list) so the two cannot drift (the q115 shared-CTE discipline).
    * Input relation `src` must provide (doc_id, `textCol`); emits
    * `bp_docs$sfx` with (doc_id, clean_text, n_lines, n_kept, n_short,
    * n_link, n_stop).
    */
  def boilerplateCtes(src: String, textCol: String, sfx: String): String = {
    import graft.expressions.BoilerplateClean._
    val stopPred = Stopwords.map(w => s"t = '$w'").mkString(" OR ")
    s"""bp_lines$sfx AS (
       |  SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS ln
       |  FROM (SELECT doc_id, string_split($textCol, chr(10)) AS arr FROM $src)),
       |bp_feat$sfx AS (
       |  SELECT doc_id, ln,
       |    trim(regexp_replace(arr[ln], '<[^>]*>', '', 'g')) AS stripped,
       |    CAST(coalesce(list_sum(list_transform(
       |      regexp_extract_all(arr[ln], '<a[^>]*>([^<]*)</a>', 1),
       |      x -> len(x))), 0) AS BIGINT) AS link_len
       |  FROM bp_lines$sfx),
       |bp_verdict$sfx AS (
       |  SELECT doc_id, ln, stripped,
       |    CASE WHEN len(stripped) < $MinLen THEN 'short'
       |         WHEN $LinkDen * link_len > $LinkNum * len(stripped) THEN 'link'
       |         WHEN len(stripped) < $NearLong AND $StopDen * len(list_filter(
       |               string_split_regex(lower(stripped), '[ \t]+'),
       |               t -> $stopPred)) <
       |             len(string_split_regex(stripped, '[ \t]+')) THEN 'stop'
       |         ELSE 'keep' END AS verdict
       |  FROM bp_feat$sfx),
       |bp_docs$sfx AS (
       |  SELECT doc_id,
       |    coalesce(string_agg(CASE WHEN verdict = 'keep' THEN stripped END,
       |                        chr(10) ORDER BY ln), '') AS clean_text,
       |    CAST(count(*) AS INT) AS n_lines,
       |    CAST(count(*) FILTER (WHERE verdict = 'keep') AS INT) AS n_kept,
       |    CAST(count(*) FILTER (WHERE verdict = 'short') AS INT) AS n_short,
       |    CAST(count(*) FILTER (WHERE verdict = 'link') AS INT) AS n_link,
       |    CAST(count(*) FILTER (WHERE verdict = 'stop') AS INT) AS n_stop
       |  FROM bp_verdict$sfx GROUP BY doc_id)""".stripMargin
  }
}
