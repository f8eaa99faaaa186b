package graft.operators

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSpec}

/** q77 (segment-level repeated-span removal) and q78 (incremental dedup
  * against the historical band index): a full sequential replay of q77's
  * keep-first semantics, q78 recomposed from q36's own pair output, and
  * an implanted-duplicate envelope that fires the within-batch leg the
  * synthetic corpus doesn't exercise (0 batch-internal dups at sf0.01).
  */
class SegmentIncrementalSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** q44/q53/q78's engine-identical md5 bucket (lang-salted, 0..255). */
  private def bucketOf(lang: String, id: Long): Int =
    Integer.parseInt(md5hex(s"$lang:$id").substring(0, 2), 16)

  test("q77 matches a sequential keep-first replay of the whole corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
      .sortBy(_._1)
    // single-threaded replay: first (doc_id, seg_idx) occurrence of each
    // segment string survives (string equality ≡ the engine's md5 keys
    // absent a collision, which the hash gate would catch anyway)
    val segs = docs.flatMap { case (id, text) =>
      text.trim.split("[ \t\n\f\r]+").grouped(16).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }.toSeq
    }
    val seen = mutable.Set[String]()
    val expected = segs.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, ss) =>
      // groupBy preserves nothing — re-sort by seg_idx; global order is
      // already (doc_id, seg_idx) because segs was built doc-ascending
      val ordered = ss.sortBy(_._2)
      val kept = ordered.filter { case (_, _, s) => seen.add(s) }
      (id, ordered.size.toLong, kept.size.toLong,
        kept.map(_._3).mkString(" "))
    }
    val got = SparkEntry.queries("q77_segment_dedup")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, w) =>
      assert(g == w, s"q77 diverged at doc ${w._1}: $g vs $w")
    }
    // the corpus must actually exercise the removal path
    assert(expected.exists(r => r._3 < r._2),
      "sf0.001 corpus has no repeated segment — replay is vacuous")
  }

  test("q78 is exactly q36's pair graph restated incrementally") {
    val langOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .toMap
    val pairs = SparkEntry.queries("q36_minhash_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val partners = mutable.Map[Long, mutable.Set[Long]]()
    pairs.foreach { case (a, b) =>
      partners.getOrElseUpdate(a, mutable.Set()) += b
      partners.getOrElseUpdate(b, mutable.Set()) += a
    }
    val isNew = (id: Long) => bucketOf(langOf(id), id) >= 230
    val expected = langOf.keys.toSeq.filter(isNew).sorted.map { id =>
      val p = partners.getOrElse(id, mutable.Set.empty[Long])
      val nHist = p.count(!isNew(_)).toLong
      val nBatch = p.count(o => isNew(o) && o < id).toLong
      (id, nHist, nBatch, nHist == 0 && nBatch == 0)
    }
    val got = SparkEntry.queries("q78_incremental_dedup")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == expected,
      s"q78 != q36∘bucket recomposition (${got.length} vs ${expected.length} rows)")
  }

  test("q78 envelope: implanted dups fire the history AND batch legs") {
    // pick ids whose md5 bucket lands on the right side of the split
    val newIds = Iterator.from(1).map(_.toLong)
      .filter(id => bucketOf("en", id) >= 230).take(3).toSeq
    val histId = Iterator.from(1).map(_.toLong)
      .filter(id => bucketOf("en", id) < 230).next()
    val dupText = (1 to 40).map(i => s"tok$i").mkString(" ")
    val uniqText = (1 to 40).map(i => s"other$i").mkString(" ")
    val Seq(newA, newB, newC) = newIds.sorted
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(histId, dupText, "en", "s1", dupText.length.toLong),
      Row(newA, dupText, "en", "s1", dupText.length.toLong),
      Row(newB, dupText, "en", "s1", dupText.length.toLong),
      Row(newC, uniqText, "en", "s1", uniqText.length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q78_incremental_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    // identical texts share every band: both new dups see the history
    // doc; the LARGER new id additionally sees the smaller as a batch
    // partner (within-batch keep-first) — only the clean doc is admitted
    assert(got == Seq(
      (newA, 1L, 0L, false),
      (newB, 1L, 1L, false),
      (newC, 0L, 0L, true)), s"envelope mismatch: $got")
  }
}
