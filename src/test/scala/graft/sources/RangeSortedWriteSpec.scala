package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The range-sorted parquet layout's data-skipping claim, proven at the
  * storage level (parquet footer statistics are disjoint and internally
  * sorted) and at the read level (an identical pushed-down range filter
  * surfaces orders of magnitude fewer rows from the scan than the
  * unsorted twin of the same data, because row-group/page stats prune).
  */
class RangeSortedWriteSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .sortBy(_.getName).toSeq

  /** Per-row-group (min, max) of a long column, in file order. */
  private def rowGroupStats(file: java.io.File, column: String): Seq[(Long, Long)] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.getAbsolutePath), new Configuration()))
    try reader.getFooter.getBlocks.asScala.toSeq.map { block =>
      val col = block.getColumns.asScala
        .find(_.getPath.toDotString == column)
        .getOrElse(fail(s"no column $column in ${file.getName}"))
      val stats = col.getStatistics
      assert(stats != null && !stats.isEmpty, s"missing stats in ${file.getName}")
      (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
        stats.genericGetMax.asInstanceOf[java.lang.Long].longValue())
    } finally reader.close()
  }

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-sorted layout: disjoint per-file key ranges, sorted row groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rangesort").toString
    val li = graft.core.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Sources.writeRangeSorted(li, dir, numFiles = 8, "l_orderkey")

    val files = parquetFiles(dir)
    assert(files.size > 1, "need multiple files to say anything about ranges")
    val perFile = files.map(f => rowGroupStats(f, "l_orderkey"))
    // within each file, row groups are sorted and non-overlapping
    perFile.foreach { gs =>
      gs.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin,
          s"row groups overlap: max $aMax > next min $bMin")
        case _ =>
      }
    }
    // across files, [min, max] key ranges are pairwise disjoint: equal
    // keys cannot straddle a range-partition boundary
    val ranges = perFile.map(gs => (gs.map(_._1).min, gs.map(_._2).max))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin,
        s"file ranges overlap: max $aMax vs next min $bMin")
      case _ =>
    }
    // full coverage: nothing was lost in the exchange
    val total = spark.read.parquet(dir).count()
    assert(total == li.count())
  }

  test("identical filter reads far fewer rows from the sorted layout than the unsorted one") {
    val sortedDir = java.nio.file.Files.createTempDirectory("graft-rs-sorted").toString
    val shuffledDir = java.nio.file.Files.createTempDirectory("graft-rs-shuffled").toString
    val li = graft.core.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Sources.writeRangeSorted(li, sortedDir, numFiles = 8, "l_orderkey")
    // unsorted twin: same rows, same file count, key order destroyed
    li.repartition(8, col("l_partkey")).write.mode("overwrite").parquet(shuffledDir)

    val keys = li.select(min("l_orderkey"), max("l_orderkey")).head()
    val (lo, hi) = (keys.getLong(0), keys.getLong(1))
    val mid = lo + (hi - lo) / 2
    val pred = col("l_orderkey").between(mid, mid + (hi - lo) / 100)

    val sortedScan = scanOutputRows(spark.read.parquet(sortedDir).filter(pred))
    val shuffledScan = scanOutputRows(spark.read.parquet(shuffledDir).filter(pred))
    val matches = spark.read.parquet(sortedDir).filter(pred).count()
    assert(matches > 0, "the probe range must select something")
    // both layouts agree on the answer; only the scanned volume differs
    assert(spark.read.parquet(shuffledDir).filter(pred).count() == matches)
    // the pushed-down predicate reaches the scan on both sides
    val pushed = spark.read.parquet(sortedDir).filter(pred)
    pushed.collect()
    val scan = collectWithSubqueries(pushed.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(l_orderkey"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    // the skipping claim, both directions: the unsorted layout's stats
    // cannot prune anything (every row group spans nearly the whole key
    // space, so the scan surfaces the ENTIRE table), while the sorted
    // layout's narrow probe is contained in ~one of the 8 disjoint
    // ranges. Allow THREE files' worth: repartitionByRange draws its
    // boundaries from a sample, so files are uneven (±10% is normal) and
    // a probe can straddle a boundary — 2 uneven files + straddle slack
    // still separates "skipped most of the table" from the unsorted
    // layout's full scan by >2×.
    val total = li.count()
    assert(shuffledScan == total,
      s"unsorted layout should scan all $total rows, scanned $shuffledScan")
    assert(sortedScan <= total * 3 / 8,
      s"sorted layout should scan <=3 of 8 files' rows: $sortedScan of $total")
  }
}
