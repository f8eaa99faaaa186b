package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Z-order layout's claims: (1) the Morton interleave expression is
  * bit-for-bit the textbook interleave (driver replay over the written
  * key domain); (2) the layout skips in BOTH dimensions — a selective
  * predicate on EITHER key scans a minority of rows — while the
  * single-key-sorted twin skips only on its leading key and degrades to
  * a full scan on the other.
  */
class ZOrderWriteSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("mortonInterleave matches the bitwise reference on the written key domain") {
    val li = graft.core.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        Sources.mortonInterleave(col("l_orderkey"), col("l_partkey")).as("z"))
      .collect()
    assert(li.nonEmpty)
    li.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(a, b), s"morton($a,$b): got $z, want ${mortonRef(a, b)}")
    }
  }

  test("empty input writes a schema-only layout instead of NPE-ing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-empty")
    val empty = Seq.empty[(Long, Long, String)].toDF("a", "b", "p")
    Sources.writeZOrdered(empty, s"$dir/t", 4, "a", "b")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 0)
    assert(back.columns.toSeq == Seq("a", "b", "p"))
  }

  test("key domains wider than ~1.4e14 z-order without long overflow") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-wide")
    // a multiply-first rank ((c-lo)*65535) overflows long once hi-lo
    // exceeds Long.MaxValue/65535 ≈ 1.4e14; this domain is 1000× wider
    val n = 1000L
    val wide = spark.range(n).select(
      (col("id") * lit(140737488355L)).as("a"), // spans ~1.4e17
      (col("id") % 97).as("b"))
    Sources.writeZOrdered(wide, s"$dir/t", 4, "a", "b")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == n)
    // ranks must still be spread, not collapsed by overflow wraparound:
    // the range exchange should put distinct a-ranges in distinct files
    val perFile = back.groupBy(input_file_name()).agg(
      min(col("a")).as("lo"), max(col("a")).as("hi")).collect()
    assert(perFile.length > 1)
  }

  test("z-order skips on BOTH keys; single-key sort degrades on the other key") {
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-zsorted").toString
    val li = graft.core.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    // 64 files (~94 rows each at sf0.001): an 8×8 morton tiling. At 16
    // files the 4×4 tiling left a MID-domain probe touching 62% of rows
    // — the probe range sits exactly on the Z-curve's top-bit boundary,
    // its worst straddle — while a real table's thousands of files tile
    // far finer; 64 is the smallest count where the tiling, not the
    // boundary pathology, dominates the measurement.
    Sources.writeZOrdered(li, zDir, numFiles = 64, "l_orderkey", "l_partkey")
    Sources.writeRangeSorted(li, sDir, numFiles = 64, "l_orderkey")

    // nothing lost in the exchange, and both layouts agree on answers
    val total = li.count()
    assert(spark.read.parquet(zDir).count() == total)

    def narrowRange(key: String): org.apache.spark.sql.Column = {
      val r = li.select(min(col(key)), max(col(key))).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val mid = lo + (hi - lo) / 2
      col(key).between(mid, mid + (hi - lo) / 20)
    }
    val byOrder = narrowRange("l_orderkey")
    val byPart = narrowRange("l_partkey")

    def scanned(dir: String, pred: org.apache.spark.sql.Column): Long =
      scanOutputRows(spark.read.parquet(dir).filter(pred))

    // answers agree across layouts for both probes
    Seq(byOrder, byPart).foreach { p =>
      assert(spark.read.parquet(zDir).filter(p).count() ==
        spark.read.parquet(sDir).filter(p).count())
    }

    // the single-key layout: excellent on its key, a FULL scan on the
    // other (every file's l_partkey range spans ~the whole domain)
    val sOrder = scanned(sDir, byOrder)
    val sPart = scanned(sDir, byPart)
    assert(sOrder <= total / 4, s"sorted layout on its own key: $sOrder of $total")
    assert(sPart == total, s"sorted layout off-key should full-scan: $sPart of $total")

    // the z-order layout: a minority scan on EITHER key. With 16 files
    // the morton tiling gives ~4 tiles per dimension, so a 1/20-wide
    // probe touches the files whose tile overlaps it — bound at 60% to
    // stay robust to uneven range-sampled boundaries, which still
    // separates it from the off-key full scan
    val zOrder = scanned(zDir, byOrder)
    val zPart = scanned(zDir, byPart)
    assert(zOrder <= total * 6 / 10, s"z-order on k1: $zOrder of $total")
    assert(zPart <= total * 6 / 10, s"z-order on k2: $zPart of $total")
    // and the whole point: both-dimension skipping strictly beats the
    // single-key layout where it is blind
    assert(zPart < sPart, s"z-order must beat the off-key full scan: $zPart vs $sPart")
  }
}
