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

/** The bloom-filtered layout's skipping claim, proven at the level the
  * parquet reader actually decides at: for a pushed-down point predicate
  * the reader skips a row group when the group's bloom filter says the
  * value is definitely absent. The spec shows (1) blooms exist in every
  * row group of the bloom columns and answer present/absent correctly,
  * (2) min/max stats could NOT have skipped those same probes (every row
  * group's range contains them — the high-cardinality-unsorted shape
  * blooms exist for), and (3) the equality predicate reaches the scan as
  * a pushed filter. Together: pushed predicate + bloom-negative row
  * group = skipped row group.
  */
class BloomFilterWriteSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .sortBy(_.getName).toSeq

  /** For each row group of `column`: (min, max, bloomAnswersFor(probes)).
    * A None bloom answer list means the row group carries no bloom.
    */
  private def rowGroupBloom(file: java.io.File, column: String,
      probes: Seq[Long]): Seq[(Long, Long, Option[Seq[Boolean]])] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.getAbsolutePath), new Configuration()))
    try reader.getFooter.getBlocks.asScala.toSeq.map { block =>
      val col = block.getColumns.asScala
        .find(_.getPath.toDotString == column)
        .getOrElse(fail(s"no column $column in ${file.getName}"))
      val stats = col.getStatistics
      val bloom = Option(reader.getBloomFilterDataReader(block)
        .readBloomFilter(col))
      (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
        stats.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
        bloom.map(b => probes.map(p => b.findHash(b.hash(p)))))
    } finally reader.close()
  }

  test("bloom skips point probes that min/max stats cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // high-cardinality fingerprints in hash order = no key clustering:
    // the shape where range stats are useless and blooms are the only
    // skipping surface
    val n = 40000L
    val data = spark.range(n).select(
      col("id").as("doc_id"),
      xxhash64(concat(lit("fp:"), col("id"))).as("fingerprint"))
    Sources.writeBloomFiltered(data, dir, numFiles = 4,
      ndv = n / 4, "fingerprint")

    val present = data.filter(col("doc_id") % 9973 === 1)
      .select("fingerprint").collect().map(_.getLong(0)).take(4).toSeq
    // absent probes: hashes from a disjoint preimage family
    val absent = (0 until 200).map(i =>
      spark.range(1).select(xxhash64(lit(s"absent:$i")))
        .head().getLong(0))
    val absentSet = absent.toSet
    assert(data.filter(col("fingerprint").isin(absentSet.toSeq: _*)).count() == 0,
      "absent probes must genuinely be absent")

    val files = parquetFiles(dir)
    assert(files.size == 4)
    val groups = files.flatMap(f =>
      rowGroupBloom(f, "fingerprint", present ++ absent))
    assert(groups.nonEmpty)
    // (2) stats CANNOT skip: every row group's [min,max] spans nearly the
    // whole long domain, so it contains every probe
    groups.foreach { case (lo, hi, _) =>
      (present ++ absent).foreach(p =>
        assert(lo <= p && p <= hi,
          s"probe $p outside [$lo,$hi] — stats would skip; shape is wrong"))
    }
    // (1) every row group carries a bloom; present values test positive
    // in at least one group (no false negatives anywhere), absent values
    // test negative in nearly all group×probe pairs (FPP is ~1%, not 0)
    assert(groups.forall(_._3.isDefined), "row group without a bloom filter")
    val answers = groups.map(g => g._3.get)
    present.indices.foreach(i =>
      assert(answers.exists(_(i)), s"present probe $i lost by every bloom"))
    val absentAnswers = for {
      a <- answers; i <- absent.indices
    } yield a(present.size + i)
    val fpRate = absentAnswers.count(identity).toDouble / absentAnswers.size
    assert(fpRate < 0.05,
      f"bloom false-positive rate $fpRate%.3f — undersized or broken filter")

    // (3) the point predicate reaches the scan pushed down
    val probe = spark.read.parquet(dir).filter(col("fingerprint") === absent.head)
    probe.collect()
    val scans = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("EqualTo(fingerprint"))),
      s"equality not pushed: ${scans.map(_.metadata.get("PushedFilters"))}")
    assert(probe.queryExecution.executedPlan.collectLeaves().nonEmpty &&
      spark.read.parquet(dir).filter(col("fingerprint") === absent.head).count() == 0)
  }
}
