package graft.sources

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sources.compactSmallFiles]]: the rewrite preserves the data
  * bit-for-bit, hits the metadata-derived file-count target, and the pass
  * is idempotent (an already-compact layout is not touched at all).
  */
class CompactSpec extends SparkSpec {

  private def partFiles(path: String): Array[File] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compaction merges small files, preserves rows, and is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    // 32 tasks -> 32 tiny files: the post-ingest layout compaction exists for
    spark.range(0, 10000).repartition(32)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
      .write.parquet(dir)
    val before = partFiles(dir)
    assert(before.length == 32)
    val want = spark.read.parquet(dir).as[(Long, String)].collect().sorted
    val totalBytes = before.map(_.length).sum

    // target sized for ~4 output files from the real total
    val target = (totalBytes + 3) / 4
    val r = Sources.compactSmallFiles(spark, dir, target)
    assert(r.rewritten && r.filesBefore == 32 && r.bytes == totalBytes)
    val after = partFiles(dir)
    assert(r.filesAfter == after.length)
    // ceil-derived target is an upper bound (the scan may plan fewer
    // partitions than the target when files are tiny)
    assert(after.length <= 4 && after.length >= 1)
    assert(after.length < before.length)
    val got = spark.read.parquet(dir).as[(Long, String)].collect().sorted
    assert(got.sameElements(want), "compaction changed the data")

    // second pass: already compact -> untouched (same files, same mtimes)
    val stamps = partFiles(dir).map(f => f.getName -> f.lastModified).toMap
    val r2 = Sources.compactSmallFiles(spark, dir, target)
    assert(!r2.rewritten && r2.filesAfter == r2.filesBefore)
    val stamps2 = partFiles(dir).map(f => f.getName -> f.lastModified).toMap
    assert(stamps2 == stamps, "no-op pass rewrote files")
  }

  test("compaction to one file when the target exceeds the total") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact1")
      .resolve("t").toString
    spark.range(0, 100).repartition(8).write.parquet(dir)
    val want = spark.read.parquet(dir).as[Long].collect().sorted
    val r = Sources.compactSmallFiles(spark, dir)
    assert(r.rewritten && r.filesBefore == 8 && r.filesAfter == 1)
    val got = spark.read.parquet(dir).as[Long].collect().sorted
    assert(got.sameElements(want))
  }
}
