package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

final case class Ev2(ts: Timestamp, user_id: Long, event_id: Long,
    event_type: String, value: Double)

/** Streaming plans run against MemoryStream and must agree with the batch
  * form of the same aggregation (stream/batch parity).
  */
class EventsStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyCounts over a memory stream matches batch aggregation") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val data = Seq(
      Ev(ts("2024-01-01 10:05:00"), "click", 1L, 1.25),
      Ev(ts("2024-01-01 10:55:00"), "click", 2L, 2.50),
      Ev(ts("2024-01-01 11:05:00"), "view", 1L, 0.75),
      Ev(ts("2024-01-01 11:59:00"), "click", 3L, 4.00))
    val stream = MemoryStream[Ev]
    stream.addData(data: _*)
    val q = EventsStream.hourlyCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly")
      .orderBy("hr", "event_type")
      .collect().map(r => (r.getAs[Timestamp]("hr").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_value_cents")))
    val batch = EventsStream.hourlyCounts(data.toDF())
      .orderBy("hr", "event_type")
      .collect().map(r => (r.getAs[Timestamp]("hr").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_value_cents")))
    assert(streamed.sameElements(batch))
    assert(streamed.exists { case (hr, et, n, cents) =>
      hr.startsWith("2024-01-01 10:") && et == "click" && n == 2 && cents == 375 })
  }

  test("file-source readStream agrees with batch on the same directory") {
    import spark.implicits._
    val data = Seq(
      Ev(ts("2024-01-01 08:10:00"), "click", 1L, 1.00),
      Ev(ts("2024-01-01 08:40:00"), "click", 2L, 2.00),
      Ev(ts("2024-01-01 09:05:00"), "view", 1L, 3.00))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    data.toDF().write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventsStream.hourlyCounts(stream)
      .writeStream.format("memory").queryName("filehourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("filehourly").orderBy("hr", "event_type")
      .collect().map(_.toSeq)
    val batch = EventsStream.hourlyCounts(spark.read.parquet(s"$dir/in"))
      .orderBy("hr", "event_type").collect().map(_.toSeq)
    assert(streamed.length == 2)
    assert(streamed.sameElements(batch))
  }

  test("userSessions groups by session_window per user") {
    import spark.implicits._
    val data = Seq(
      Ev(ts("2024-01-01 09:00:00"), "click", 7L, 1.00),
      Ev(ts("2024-01-01 09:10:00"), "view", 7L, 2.00),
      // >30min gap -> new session
      Ev(ts("2024-01-01 10:30:00"), "click", 7L, 3.00))
    val out = EventsStream.userSessions(data.toDF())
      .filter(col("user_id") === 7L).orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("userSessions(6h) agrees with the oracle-gated batch q61 on real events") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    // the two formulations differ only on an EXACT-threshold gap
    // (session_window splits at >= gap, q61's lag form at > gap);
    // prove the edge is absent from the corpus, then parity is exact
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val exactEdge = ev
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us") === 6L * 3600L * 1000000L)
      .count()
    assert(exactEdge == 0L, "corpus has an exact 6h gap; parity undefined")
    val viaSessionWindow = EventsStream.userSessions(ev, "6 hours")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("sum_value_cents"))
      .collect().map(_.toSeq).toSet
    val viaQ61 = graft.SparkEntry.queries("q61_sessionize")(
        spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("sum_value_cents"))
      .collect().map(_.toSeq).toSet
    assert(viaSessionWindow == viaQ61)
    assert(viaQ61.nonEmpty)
  }

  test("stream-stream interval join pairs clicks with trailing-hour purchases") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev2]
    val q = EventsStream.recentPurchaseJoin(stream.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      stream.addData(
        Ev2(ts("2024-01-01 08:30:00"), 1L, 10L, "purchase", 2.0), // > 1h before
        Ev2(ts("2024-01-01 09:30:00"), 1L, 11L, "purchase", 3.0), // in window
        Ev2(ts("2024-01-01 10:00:00"), 1L, 100L, "click", 0.0),
        Ev2(ts("2024-01-01 10:10:00"), 1L, 12L, "purchase", 4.0), // after click
        Ev2(ts("2024-01-01 11:00:00"), 2L, 200L, "click", 0.0))
      q.processAllAvailable()
      // the matching purchase for click 200 arrives in a LATER batch,
      // slightly out of order but inside the lateness bound
      stream.addData(Ev2(ts("2024-01-01 10:55:00"), 2L, 13L, "purchase", 6.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssjoin")
      .select("click_id", "purchase_id", "value", "age_us")
      .collect().map(_.toSeq).toSet
    assert(streamed == Set(
      Seq(100L, 11L, 3.0, 30L * 60L * 1000000L),
      Seq(200L, 13L, 6.0, 5L * 60L * 1000000L)))
    // stream/batch parity: the same plan-builder over the same rows as a
    // batch frame produces the identical pair set
    val allRows = Seq(
      Ev2(ts("2024-01-01 08:30:00"), 1L, 10L, "purchase", 2.0),
      Ev2(ts("2024-01-01 09:30:00"), 1L, 11L, "purchase", 3.0),
      Ev2(ts("2024-01-01 10:00:00"), 1L, 100L, "click", 0.0),
      Ev2(ts("2024-01-01 10:10:00"), 1L, 12L, "purchase", 4.0),
      Ev2(ts("2024-01-01 11:00:00"), 2L, 200L, "click", 0.0),
      Ev2(ts("2024-01-01 10:55:00"), 2L, 13L, "purchase", 6.0))
    val batch = EventsStream.recentPurchaseJoin(allRows.toDF())
      .select("click_id", "purchase_id", "value", "age_us")
      .collect().map(_.toSeq).toSet
    assert(batch == streamed)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp, String)]
    stream.addData(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:01"), "click"), // duplicate delivery
      (2L, ts("2024-01-01 10:05:00"), "view"))
    val q = EventsStream.dedupedEvents(
        stream.toDF().toDF("event_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup").select("event_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("mapGroupsWithState accumulates running user totals across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val q = EventsStream.runningUserTotals(spark,
        stream.toDF())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      stream.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 7L, 1.00),
        Ev(ts("2024-01-01 10:01:00"), "click", 7L, 2.00))
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 10:02:00"), "view", 7L, 0.50))
      q.processAllAvailable()
    } finally q.stop()
    // update mode emits one row per batch; the LAST row carries the
    // cumulative state (3 events, 350 cents)
    val rows = spark.table("running").filter(col("user_id") === 7L)
      .collect().map(r => (r.getAs[Long]("n_events"),
        r.getAs[Long]("sum_value_cents")))
    assert(rows.contains((2L, 300L)))
    assert(rows.contains((3L, 350L)))
  }
}
