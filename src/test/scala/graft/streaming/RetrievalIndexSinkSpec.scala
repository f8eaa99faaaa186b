package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.PostingsIndex

/** Continuous postings-index maintenance: stream scores must equal the
  * batch loop AND a monolithic rebuild, survive engine restart, and —
  * the seam this sink exists to close — replay a batch whose previous
  * attempt appended its postings but crashed before the sidecar commit,
  * converging to byte-identical scores. The seam is proven REAL first:
  * a naive (unversioned) double-append double-counts df/corpus stats
  * and shifts every score.
  */
class RetrievalIndexSinkSpec extends SparkSpec {

  import spark.implicits._

  private val seed = Seq(
    1L -> "spark shuffles the hash join build side",
    2L -> "parquet footers carry min max stats",
    3L -> "the hash aggregate spills to disk")
  private val batch1 = Seq(
    10L -> "broadcast the small hash side of a join",
    11L -> "sort merge join avoids the broadcast")
  private val batch2 = Seq(
    20L -> "stats drive the join reorder",
    21L -> "a bucketed scan skips the shuffle before the join")

  private val qts: Seq[(Long, String)] =
    Seq(1L -> "hash", 1L -> "join", 2L -> "stats", 2L -> "shuffle")

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private var n = 0
  /** Fresh index seeded with the seed corpus (sidecar v=0). */
  private def freshIndex(): (String, java.nio.file.Path) = {
    n += 1
    val name = s"graft_retr_sink_$n"
    val path = Files.createTempDirectory(s"graft-retr-$n").resolve("idx")
    PostingsIndex.buildIndexDocs(spark, df(seed), name, path)
    (name, path)
  }

  private def scores(name: String, path: java.nio.file.Path): Seq[Seq[Any]] =
    PostingsIndex.probeScoresFor(spark, name, path, qts)
      .orderBy("q_id", "doc_id").collect().toSeq.map(_.toSeq)

  test("the seam is real: a naive unversioned double-append shifts scores") {
    val (clean, cleanP) = freshIndex()
    PostingsIndex.append(spark, clean, cleanP, df(batch1))
    val (naive, naiveP) = freshIndex()
    PostingsIndex.append(spark, naive, naiveP, df(batch1))
    PostingsIndex.append(spark, naive, naiveP, df(batch1)) // replayed, unguarded
    assert(scores(naive, naiveP) != scores(clean, cleanP),
      "unguarded replay must double-count df/stats — else this sink is pointless")
  }

  test("replay across the append/sidecar crash window converges bit-for-bit") {
    val (clean, cleanP) = freshIndex()
    assert(RetrievalIndexSink.applyBatch(df(batch1), 0L, clean, cleanP))
    val want = scores(clean, cleanP)

    val (crashed, crashedP) = freshIndex()
    // attempt 1 appends postings, then "crashes" before the sidecar commit
    PostingsIndex.appendPostingsOnly(spark, crashed, df(batch1))
    // the replay must converge despite the leftover duplicate rows
    assert(RetrievalIndexSink.applyBatch(df(batch1), 0L, crashed, crashedP))
    // non-vacuity: the postings table really does hold duplicates now
    val t = spark.table(crashed)
    assert(t.count() > t.distinct().count(),
      "crash simulation must leave duplicate postings rows")
    assert(scores(crashed, crashedP) == want)

    // a replay of the fully-committed batch is skipped outright
    assert(!RetrievalIndexSink.applyBatch(df(batch1), 0L, crashed, crashedP))
    assert(scores(crashed, crashedP) == want)
  }

  test("stream equals the batch loop equals a monolithic rebuild") {
    val (name, path) = freshIndex()
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = RetrievalIndexSink.attach(
      stream.toDF().toDF("doc_id", "text"), name, path,
      Files.createTempDirectory("graft-retr-ckpt").toString)
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = scores(name, path)

    val (loop, loopP) = freshIndex()
    PostingsIndex.append(spark, loop, loopP, df(batch1))
    PostingsIndex.append(spark, loop, loopP, df(batch2))
    assert(got == scores(loop, loopP))

    val mono = "graft_retr_sink_mono"
    val monoP = Files.createTempDirectory("graft-retr-mono").resolve("idx")
    PostingsIndex.buildIndexDocs(spark, df(seed ++ batch1 ++ batch2),
      mono, monoP)
    assert(got == scores(mono, monoP),
      "incremental sidecar deltas must equal the from-scratch stats")
    assert(got.nonEmpty)
  }

  test("restart from checkpoint continues the version chain") {
    val (name, path) = freshIndex()
    val ckpt = Files.createTempDirectory("graft-retr-ckpt2").toString
    implicit val sql = spark.sqlContext
    val s1 = MemoryStream[(Long, String)]
    val q1 = RetrievalIndexSink.attach(
      s1.toDF().toDF("doc_id", "text"), name, path, ckpt)
    try { s1.addData(batch1: _*); q1.processAllAvailable() }
    finally q1.stop()
    assert(PostingsIndex.sidecarVersion(path) == 1L)

    val s2 = MemoryStream[(Long, String)]
    s2.addData(batch1: _*) // source replays from offset 0 into batch 0 …
    val q2 = RetrievalIndexSink.attach(
      s2.toDF().toDF("doc_id", "text"), name, path, ckpt)
    try { s2.addData(batch2: _*); q2.processAllAvailable() }
    finally q2.stop()

    val (loop, loopP) = freshIndex()
    PostingsIndex.append(spark, loop, loopP, df(batch1))
    PostingsIndex.append(spark, loop, loopP, df(batch2))
    assert(scores(name, path) == scores(loop, loopP))
  }
}
