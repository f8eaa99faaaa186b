package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Persisted, BUCKETED inverted index for BM25 — the [[BandIndex]]
  * pattern applied to lexical retrieval.
  *
  * q88 computes correct scores but rebuilds tf/df/corpus-stats from the
  * raw text on EVERY probe — O(corpus) per query set, the same
  * recompute-the-history shape q78 had before round 10 materialized its
  * band index. This object is the serving-path fix: postings
  * `(term, doc_id, tf, dl)` are materialized once per corpus generation
  * as a parquet table bucketed by `term` — a SINGLE bucket column, so
  * Spark's bucket pruning applies to the probe's literal
  * `term IN (...)` predicate and a query touches only the buckets its
  * terms hash into (`SelectedBucketsCount: k out of N` in the scan —
  * [[graft.operators.RetrievalSpec]]-adjacent PostingsIndexSpec pins
  * it). Term statistics (df) and corpus constants (n_docs, sum_dl) are
  * vocabulary-sized / O(1) side tables written beside the postings, so
  * a probe reads NO raw text at all: per-query cost is
  * O(postings-of-query-terms), not O(corpus).
  *
  * Freshness + restart reuse the [[BandIndex]] contract verbatim: a
  * `_GRAFT_FP` file-metadata fingerprint of `documents.parquet` gates
  * rebuilds (written last, so a half-built index is rebuilt, never
  * read), and an on-disk index re-registers into a fresh JVM's
  * in-memory catalog without rebuilding.
  *
  * q91 probes this index with q88's query set and must emit q88's rows
  * bit-for-bit — it shares q88's DuckDB oracle, the materialization-
  * not-semantics gate q78 established.
  */
object PostingsIndex {

  val NumBuckets = 32

  def indexRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_POSTINGS_DIR", "/tmp/graft-postings-index")

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def tableNameFor(dir: String): String =
    "graft_postings_" + md5hex(
      Paths.get(dir).toAbsolutePath.normalize.toString).take(12)

  private def indexPath(dir: String): Path =
    Paths.get(indexRoot, tableNameFor(dir))

  private val WordRe = "[a-z0-9]+"

  /** (term, doc_id, tf, dl) for a (doc_id, text) frame — one shuffle on
    * (doc_id, term), dl carried in the grouping key (functionally
    * dependent on doc_id, costs nothing).
    */
  private def postingsOfDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr(s"regexp_extract_all(lower(text), '$WordRe', 0)").as("ws"))
      .select(col("doc_id"), size(col("ws")).as("dl"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")

  /** (docs in frame, sum of their dl) — docs whose text has ZERO word
    * tokens never enter the postings frame, but corpus stats must still
    * count them (dl = 0 adds nothing to sum_dl but DOES grow n_docs,
    * and BM25's idf sees N).
    */
  private def statsOfDocs(docs: DataFrame, postings: DataFrame): (Long, Long) = {
    val s = postings.groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    (docs.count(), s.getLong(0))
  }

  /** Build postings + df + corpus meta over a (doc_id, text) frame at
    * `path`, registered as `name`.
    */
  def buildIndexDocs(spark: SparkSession, docs: DataFrame, name: String,
      path: Path): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    deleteTree(path)
    val p = postingsOfDocs(docs).localCheckpoint(true)
    p.repartition(NumBuckets, col("term"))
      .write.format("parquet")
      .bucketBy(NumBuckets, "term")
      .sortBy("term")
      .option("path", path.toString)
      .saveAsTable(name)
    p.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(path.resolve("dfreq").toString)
    val (n, sumDl) = statsOfDocs(docs, p)
    Files.writeString(path.resolve("_GRAFT_META"), s"$n $sumDl")
    p.unpersist()
  }

  /** Build from the corpus under `dir` (q91's entry). */
  def buildIndex(spark: SparkSession, dir: String, name: String,
      path: Path): Unit =
    buildIndexDocs(spark,
      Tables(spark, dir, "documents").select("doc_id", "text"), name, path)

  /** Admit a batch into the index: postings appended through the
    * bucketed writer (layout preserved), df merged by term, corpus
    * meta advanced by the batch's (count, Σdl) — the same signed-delta
    * maintenance algebra as q86, specialized to monotone inserts. The
    * df rewrite is vocabulary-sized, NOT corpus-sized: the merge reads
    * the old df table, adds the batch's per-term counts, and is pinned
    * eagerly before overwriting the files it read.
    */
  def append(spark: SparkSession, name: String, path: Path,
      newDocs: DataFrame): Unit = {
    val p = postingsOfDocs(newDocs).localCheckpoint(true)
    p.repartition(NumBuckets, col("term"))
      .write.format("parquet")
      .bucketBy(NumBuckets, "term")
      .sortBy("term")
      .mode("append")
      .saveAsTable(name)
    val dfPath = path.resolve("dfreq").toString
    val merged = spark.read.parquet(dfPath)
      .unionByName(p.groupBy("term").agg(count(lit(1)).as("df")))
      .groupBy("term").agg(sum(col("df")).as("df"))
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(dfPath)
    merged.unpersist()
    val (bn, bDl) = statsOfDocs(newDocs, p)
    val old = Files.readString(path.resolve("_GRAFT_META")).trim
      .split(" ").map(_.toLong)
    Files.writeString(path.resolve("_GRAFT_META"),
      s"${old(0) + bn} ${old(1) + bDl}")
    p.unpersist()
  }

  private def register(spark: SparkSession, name: String, path: Path): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(
      s"""CREATE TABLE `$name` (term STRING, doc_id BIGINT, tf BIGINT, dl INT)
         |USING PARQUET
         |CLUSTERED BY (term) INTO $NumBuckets BUCKETS
         |LOCATION '${path.toString}'""".stripMargin)
  }

  /** Ensure the postings index for `dir` is fresh and in this session's
    * catalog; returns (table name, n_docs, sum_dl). Warm cost: catalog
    * lookup + O(#files) fingerprint; cold: one O(corpus) build, paid per
    * corpus generation, never per probe.
    */
  def ensure(spark: SparkSession, dir: String): (String, Long, Long) =
    synchronized {
      val name = tableNameFor(dir)
      val path = indexPath(dir)
      val fp = BandIndex.fingerprint(dir)
      val fpFile = path.resolve("_GRAFT_FP")
      val validOnDisk = Files.exists(fpFile) &&
        Files.readString(fpFile).trim == fp
      if (!validOnDisk) {
        buildIndex(spark, dir, name, path)
        Files.writeString(fpFile, fp)
      } else if (!spark.catalog.tableExists(name)) {
        register(spark, name, path)
      }
      val meta = Files.readString(path.resolve("_GRAFT_META")).trim
        .split(" ").map(_.toLong)
      (name, meta(0), meta(1))
    }

  /** BM25 scores from the PERSISTED index for a literal query-term set:
    * (q_id, doc_id, n_hit, bm25_micro), identical values to
    * [[Retrieval.bm25Scores]]. The literal `isin` predicate on the
    * single bucket column is what turns bucketing into bucket PRUNING —
    * the scan reads only the buckets the query terms hash into. The df
    * side is filtered by the same literal before its (broadcast) join,
    * so no vocabulary-sized work survives either.
    */
  def probeScores(spark: SparkSession, dir: String,
      queryTerms: Seq[(Long, String)]): DataFrame = {
    ensure(spark, dir)
    probeScoresFor(spark, tableNameFor(dir), indexPath(dir), queryTerms)
  }

  /** As [[probeScores]], against an already-built named index — the
    * maintenance-loop entry (q92): corpus stats and df are read from
    * the index's CURRENT sidecars, so the same call scores against
    * whatever corpus the index covers at that moment. Callers that
    * probe between appends must pin the result eagerly (the postings
    * scan is lazy; the meta lits are captured at plan build).
    */
  def probeScoresFor(spark: SparkSession, name: String, path: Path,
      queryTerms: Seq[(Long, String)]): DataFrame = {
    val meta = Files.readString(path.resolve("_GRAFT_META")).trim
      .split(" ").map(_.toLong)
    val (nDocs, sumDl) = (meta(0), meta(1))
    val terms = queryTerms.map(_._2).distinct
    val avgdl = sumDl.toDouble / nDocs.toDouble
    import spark.implicits._
    val qt = queryTerms.toDF("q_id", "term")
    val dfreq = spark.read.parquet(path.resolve("dfreq").toString)
      .filter(col("term").isin(terms: _*))
    val idf = log(lit(1.0) +
      ((lit(nDocs) - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfSat = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
        lit(0.75) * col("dl").cast("double") / lit(avgdl)))
    spark.table(name)
      .filter(col("term").isin(terms: _*))
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .select(col("q_id"), col("doc_id"),
        round(idf * tfSat * lit(1e6)).cast("long").as("term_micro"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("n_hit"), sum(col("term_micro")).as("bm25_micro"))
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(p.toFile)
    }
}
