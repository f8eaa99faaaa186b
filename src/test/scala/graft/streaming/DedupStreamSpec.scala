package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming MinHash near-dup: per-row signature parity with the batch
  * aggregation, and cross-batch first-seen flagging semantics.
  */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._

  private val original =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearCopy =
    "the quick brown fox jumps over the lazy dog near the river bank now"
  private val unrelated =
    "completely different words about spark shuffles and parquet footers here"

  test("per-row signature equals the batch groupBy signature") {
    // the stream folds min(md5(seed:shingle)) per ROW; q36's batch path
    // aggregates min over exploded shingles — same min-wise family, must
    // be identical on identical text
    val docs = Seq((1L, original), (2L, unrelated)).toDF("id", "text")
    val perRow = docs
      .select(col("id"), DedupStream.signature(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    val exploded = docs
      .select(col("id"), explode(expr(
        """array_distinct(filter(
          |  zip_with(
          |    zip_with(split(trim(text), '\\s+'),
          |      slice(split(trim(text), '\\s+'), 2,
          |        greatest(size(split(trim(text), '\\s+')) - 1, 0)),
          |      (a, b) -> concat(a, ' ', b)),
          |    slice(split(trim(text), '\\s+'), 3,
          |      greatest(size(split(trim(text), '\\s+')) - 2, 0)),
          |    (ab, c) -> concat(ab, ' ', c)),
          |  x -> x IS NOT NULL))""".stripMargin)).as("sh"))
    val agged = exploded.groupBy("id")
      .agg(array((0 until 8).map(i =>
        min(md5(concat_ws(":", lit(i), col("sh"))))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(perRow == agged)
  }

  test("cross-batch collisions flag against the first-seen representative") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = DedupStream.nearDupFlags(spark, stream.toDF().toDF("id", "text"))
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, original), (2L, unrelated))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 1 (shares bands) + a fresh doc
      stream.addData((3L, nearCopy), (4L, "totally novel content streaming in fresh tokens only"))
      q.processAllAvailable()
    } finally q.stop()
    val flags = spark.table("neardup_stream")
      .select("doc_id", "dup_of").distinct()
      .as[(Long, Long)].collect().toSet
    assert(flags.contains((3L, 1L)), s"near-copy not flagged: $flags")
    assert(!flags.exists(_._1 == 2L), "unrelated doc wrongly flagged")
    assert(!flags.exists(_._1 == 4L), "novel doc wrongly flagged")
  }
}
