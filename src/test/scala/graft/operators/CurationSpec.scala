package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions.{col, length, lit}

import graft.SparkSpec
import graft.core.Tables

/** q81–q83 curation family: sequential replays of the snapshot diff, the
  * decile retention curve, and the per-source dataset card. Value parity
  * vs DuckDB is the driver gate; these pin semantics (the replay is an
  * independent driver-side reimplementation, not a second Spark plan)
  * plus the q82 plan shape (the 9-row threshold dim must broadcast).
  */
class CurationSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def wsTokens(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array(t) else t.split("[ \t\n\f\r]+")
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("q81 snapshot diff matches a sequential replay; all classes fire") {
    val orders = Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    val old = orders.filter(_._1 % 10 != 3)
      .map(o => o._1 -> (o._2, o._3, o._4)).toMap
    val nw = orders.filter(_._1 % 10 != 7).map { o =>
      val price = if (o._1 % 13 == 0) o._3 + 1 else o._3
      val prio = if (o._1 % 17 == 0) "9-SYNTH" else o._4
      o._1 -> (o._2, price, prio)
    }.toMap
    val expected = (old.keySet ++ nw.keySet).toSeq.sorted.flatMap { k =>
      (old.get(k), nw.get(k)) match {
        case (None, Some(_)) => Some((k, "added", ""))
        case (Some(_), None) => Some((k, "removed", ""))
        case (Some(o), Some(n)) if o != n =>
          val cols = Seq(
            if (o._1 != n._1) Some("o_orderstatus") else None,
            if (o._2 != n._2) Some("o_totalprice") else None,
            if (o._3 != n._3) Some("o_orderpriority") else None).flatten
          Some((k, "changed", cols.mkString(",")))
        case _ => None
      }
    }
    val got = run("q81_snapshot_diff").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[String]("status"),
        r.getAs[String]("changed_cols"))).toSeq
    assert(got == expected)
    // the corpus genuinely exercises every class — a diff where one class
    // never fires would vacuously pass the replay
    val statuses = got.map(_._2).toSet
    assert(statuses == Set("added", "removed", "changed"))
    assert(got.exists(_._3.contains(",")),
      "expected at least one row with BOTH price and priority changed " +
        "(key divisible by 13*17 within both snapshots)")
  }

  test("q82 retention curve matches brute-force thresholds; dim broadcasts") {
    val counts = Tables(spark, sf0001, "documents").select("text").collect()
      .map(r => wsTokens(r.getString(0)).length.toLong)
    val sorted = counts.sorted
    val n = sorted.length
    // percentile_disc: smallest element whose cumulative distribution
    // reaches the fraction — sorted(ceil(q*n) - 1)
    def disc(q: Double): Long =
      sorted(math.ceil(q * n).toInt - 1)
    val expected = (1 to 9).map { i =>
      val t = disc(i / 10.0)
      val keep = counts.filter(_ >= t)
      (i, t, keep.length.toLong, keep.sum)
    }
    val df = run("q82_retention_curve")
    val got = df.collect().map(r => (r.getAs[Int]("decile"),
      r.getAs[Long]("threshold"), r.getAs[Long]("docs_retained"),
      r.getAs[Long]("tokens_retained"))).toSeq
    assert(got == expected)
    // retention is monotone: a higher threshold never keeps more
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 >= a._2 && b._3 <= a._3 && b._4 <= a._4)
    }
    // plan shape: the 9-row threshold dim joins as a broadcast nested
    // loop (a shuffle against a 9-row side would be the wrong plan at
    // any scale)
    df.collect()
    val bnl = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "threshold dim should broadcast")
  }

  test("q83 dataset card matches a sequential replay; dups are cross-source") {
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))
    def fp(text: String): String =
      md5hex(text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim)
    val mult = docs.groupBy(d => fp(d._5)).view.mapValues(_.length).toMap
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val dups = ds.count(d => mult(fp(d._5)) > 1)
      // countDistinct (Spark) / count(DISTINCT ...) (DuckDB) drop nulls
      (src, ds.length.toLong, ds.map(_._3).filter(_ != null).distinct.length.toLong,
        ds.map(d => wsTokens(d._5).length.toLong).sum,
        ds.map(_._4).sum, dups.toLong,
        dups.toDouble / ds.length.toDouble)
    }
    val got = run("q83_dataset_card").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_langs"), r.getAs[Long]("tokens_total"),
        r.getAs[Long]("chars_total"), r.getAs[Long]("dup_docs"),
        r.getAs[Double]("dup_ratio"))).toSeq
    assert(got == expected)
    // the multiplicity is CORPUS-wide, not per-source: if any fingerprint
    // spans two sources, a per-source-only count would undercount — prove
    // the property is at least exercised or explicitly vacuous
    val bySrc = docs.groupBy(d => fp(d._5)).values.filter(_.length > 1)
    if (bySrc.exists(g => g.map(_._2).distinct.length > 1))
      assert(got.map(_._6).sum ==
        docs.count(d => mult(fp(d._5)) > 1).toLong)
  }

  test("q84 DSIR weights: target docs score higher on average; zeros only for bigram-less docs") {
    val rows = run("q84_dsir_weight").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("in_target"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("dsir_micro_nats")))
    assert(rows.nonEmpty)
    // every doc appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    // zero bigrams <=> zero weight (the left-join floor)
    rows.foreach { case (id, _, nb, w) =>
      if (nb == 0L) assert(w == 0L, s"doc $id: no bigrams but weight $w")
    }
    // the defining DSIR property: the target slice's own documents are,
    // on average, far more target-like than the rest of the corpus —
    // compare mean per-bigram log-ratio between the two groups
    def meanPerBigram(g: Seq[(Long, Boolean, Long, Long)]): Double = {
      val withB = g.filter(_._3 > 0)
      withB.map(r => r._4.toDouble / r._3.toDouble).sum / withB.size
    }
    val (tgt, rest) = rows.toSeq.partition(_._2)
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(meanPerBigram(tgt) > meanPerBigram(rest),
      "target docs must score higher under the target LM than the corpus at large")
  }

  test("q85 compression ratio: driver replay parity and monotone envelopes") {
    val rows = run("q85_compress_ratio").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_chars_text"),
        r.getAs[Double]("deflate_ratio")))
    assert(rows.nonEmpty)
    // replay a sample on the driver with the same pinned codec — the UDF
    // must agree byte-for-byte with java.util.zip at level 6
    val texts = Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { case (id, _, ratio) =>
      val raw = texts(id).getBytes(StandardCharsets.UTF_8)
      val expect = Curation.deflatedSize(raw).toDouble /
        math.max(raw.length, 1).toDouble
      assert(ratio == expect, s"doc $id: $ratio != $expect")
    }
    // envelopes: pure repetition compresses an order of magnitude below
    // prose; all ratios are positive and bounded — deflate's fixed
    // overhead (2B header + 5B/block + 4B adler) pushes TINY docs above
    // 1.0, so the upper bound must be length-aware
    import spark.implicits._
    val synth = Seq(
      (1L, "a " * 2000),
      (2L, (1 to 400).map(i => s"w${i * 7919 % 1000}").mkString(" "))
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-compress").toString
    synth.withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sr = run2("q85_compress_ratio", dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("deflate_ratio")))
      .toMap
    assert(sr(1L) < 0.05, s"pure repetition should crush: ${sr(1L)}")
    assert(sr(2L) > sr(1L) * 5, "varied words must compress far worse")
    rows.foreach { case (id, len, ratio) =>
      val bound = 1.0 + 20.0 / math.max(len, 1)
      assert(ratio > 0.0 && ratio < bound,
        s"doc $id len $len ratio $ratio out of range (bound $bound)")
    }
  }

  private def run2(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q86 incremental rollup equals a direct recompute; migration class fires") {
    // independent direct recompute of the new snapshot's rollup (the
    // oracle's shape, but replayed on the driver so this spec does not
    // depend on the incremental plumbing it is checking)
    val orders = Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def centsOf(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val direct = orders.filter(_._1 % 10 != 7).map { o =>
      val prio = if (o._1 % 17 == 0) "9-SYNTH" else o._2
      val c = if (o._1 % 13 == 0) centsOf((o._3 + 1) * 100)
              else centsOf(o._3 * 100)
      (prio, c)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, rs) => (p, rs.length.toLong, rs.map(_._2).sum) }
    val got = run("q86_incremental_rollup").collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("cents_total"))).toSeq
    assert(got == direct)
    // the classes that make the delta algebra non-trivial must fire:
    // a mutation-only group, and group migration away from the donors
    assert(got.exists(_._1 == "9-SYNTH"),
      "the mutated priority group must exist in the maintained rollup")
    val donors = orders.filter(o => o._1 % 17 == 0 && o._1 % 10 != 7)
    assert(donors.nonEmpty, "migration class must be populated at this SF")
  }
}
