package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class AsOfEv(ts: Timestamp, user_id: Long, event_id: Long,
    event_type: String, value: Double)

/** AsOfStream: watermark-correct as-of semantics — answers defer until the
  * watermark passes the probe, so out-of-order builds inside the lateness
  * bound cannot change an emitted answer; pending probes flush via
  * event-time timeout for idle users; full-corpus parity with batch q62.
  */
class AsOfStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runBatches(batches: Seq[Seq[AsOfEv]]): Seq[AsOfStream.AsOfMatch] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[AsOfEv]
    val q = AsOfStream.asOfMatches(spark, stream.toDF())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table("asof").as[AsOfStream.AsOfMatch].collect().toSeq
  }

  test("an out-of-order build arriving after the probe still wins") {
    val out = runBatches(Seq(
      // probe at 10:30 and an old build; sentinel wm -> 10:25 (< probe)
      Seq(AsOfEv(ts("2024-01-01 10:30:00"), 1L, 100L, "click", 0.0),
        AsOfEv(ts("2024-01-01 09:00:00"), 1L, 10L, "purchase", 5.0),
        AsOfEv(ts("2024-01-01 10:35:00"), 9L, 900L, "purchase", 0.0)),
      // a LATER build (10:28) arrives out of order, still >= watermark;
      // the probe must not have been answered yet
      Seq(AsOfEv(ts("2024-01-01 10:28:00"), 1L, 11L, "purchase", 7.0),
        AsOfEv(ts("2024-01-01 10:45:00"), 9L, 901L, "purchase", 0.0)),
      // wm -> 10:35 >= 10:30: emit, and the 10:28 build wins over 09:00
      Seq(AsOfEv(ts("2024-01-01 10:50:00"), 9L, 902L, "purchase", 0.0))))
    val m = out.filter(_.probe_id == 100L)
    assert(m.length == 1)
    assert(m.head.match_id.contains(11L))
    assert(m.head.match_value.contains(7.0))
    assert(m.head.staleness_us.contains(120L * 1000000L))
  }

  test("event-time timeout flushes a pending probe for an idle user") {
    val out = runBatches(Seq(
      Seq(AsOfEv(ts("2024-01-01 08:00:00"), 2L, 20L, "purchase", 1.5),
        AsOfEv(ts("2024-01-01 08:30:00"), 2L, 200L, "click", 0.0)),
      // user 2 never sends again; only another user advances the watermark
      Seq(AsOfEv(ts("2024-01-01 09:30:00"), 9L, 903L, "purchase", 0.0)),
      Seq(AsOfEv(ts("2024-01-01 10:00:00"), 9L, 904L, "purchase", 0.0))))
    val m = out.filter(_.probe_id == 200L)
    assert(m.length == 1, s"pending probe never flushed: $out")
    assert(m.head.match_id.contains(20L))
  }

  test("a probe with no qualifying build emits an unmatched row") {
    val out = runBatches(Seq(
      // build exists but only AFTER the probe's event time
      Seq(AsOfEv(ts("2024-01-01 08:00:00"), 3L, 300L, "click", 0.0),
        AsOfEv(ts("2024-01-01 08:10:00"), 3L, 30L, "purchase", 9.0)),
      Seq(AsOfEv(ts("2024-01-01 09:30:00"), 9L, 905L, "purchase", 0.0))))
    val m = out.filter(_.probe_id == 300L)
    assert(m.length == 1)
    assert(m.head.match_id.isEmpty && m.head.staleness_us.isEmpty)
  }

  test("crash recovery: buffered builds and pending probes survive a restart") {
    // the query dies while a probe is still pending (watermark below it)
    // and restarts from its checkpoint; the answer must come from state
    // restored off the state store — committed batches are not re-read —
    // and must include a build that arrived BEFORE the crash
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-asof-ckpt").toString
    val stream = MemoryStream[AsOfEv]
    val got = scala.collection.mutable.ArrayBuffer[AsOfStream.AsOfMatch]()
    val collectBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (df, _) => {
        val rows = df.as[AsOfStream.AsOfMatch].collect()
        got.synchronized { got ++= rows }
      }
    def start() = AsOfStream.asOfMatches(spark, stream.toDF())
      .writeStream.foreachBatch(collectBatch)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: a build and a pending probe (wm stays below the probe), crash
    val q1 = start()
    try {
      stream.addData(
        AsOfEv(ts("2024-01-01 10:00:00"), 5L, 50L, "purchase", 3.25),
        AsOfEv(ts("2024-01-01 10:20:00"), 5L, 500L, "click", 0.0))
      q1.processAllAvailable()
      assert(got.synchronized(got.isEmpty),
        s"probe must still be pending at crash time: $got")
    } finally q1.stop()

    // run 2: restart; only a sentinel advances the watermark — the match
    // must surface the PRE-crash build from restored state
    val q2 = start()
    try {
      stream.addData(AsOfEv(ts("2024-01-01 12:00:00"), 9L, 906L, "purchase", 0.0))
      q2.processAllAvailable()
      stream.addData(AsOfEv(ts("2024-01-01 13:00:00"), 9L, 907L, "purchase", 0.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val m = got.synchronized(got.filter(_.probe_id == 500L))
    assert(m.length == 1, s"pending probe lost across restart: $got")
    assert(m.head.match_id.contains(50L))
    assert(m.head.match_value.contains(3.25))
    assert(m.head.staleness_us.contains(20L * 60L * 1000000L))
  }

  test("full-corpus parity with the oracle-gated batch q62") {
    import spark.implicits._
    val ev = graft.core.Tables(spark, sf0001, "events")
      .select("ts", "user_id", "event_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .as[AsOfEv].collect().toSeq
    val sentinel = AsOfEv(ts("2024-12-31 00:00:00"), 999999L, 999999L, "purchase", 0.0)
    val streamed = runBatches(Seq(ev, Seq(sentinel)))
      .map(m => (m.probe_id, m.user_id, m.match_id, m.match_value,
        m.staleness_us)).toSet
    val batch = graft.SparkEntry.queries("q62_asof_join")(spark, sf0001)
      .collect().map { r =>
        (r.getAs[Long]("probe_id"), r.getAs[Long]("user_id"),
          Option(r.getAs[java.lang.Long]("match_id")).map(_.longValue),
          Option(r.getAs[java.lang.Double]("match_value")).map(_.doubleValue),
          Option(r.getAs[java.lang.Long]("staleness_us")).map(_.longValue))
      }.toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
