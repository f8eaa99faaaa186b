package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Streaming rollup maintenance: after EVERY batch the incrementally
  * maintained per-name rollup must equal a direct groupBy over the
  * maintained snapshot (the lambda-convergence property q86 proves in
  * batch form), through accumulation, group migration (a key's name
  * changing moves its contribution between groups), tombstones (a group
  * cancelling to zero disappears), and the crash-replay seams — both
  * the plain redelivery and the nasty window where the SNAPSHOT sink
  * committed a batch the rollup sink has not seen yet.
  */
class RollupSinkSpec extends SparkSpec {

  import spark.implicits._

  private def at(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def changes(rows: (Long, String, Long, Boolean, Timestamp)*) =
    rows.toDF("key", "name", "delta_cents", "deleted", "ts")

  private def rollupMap(dir: String): Map[String, (Long, Long)] =
    RollupSink.rollup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def directOfSnapshot(snapDir: String): Map[String, (Long, Long)] =
    UpsertSink.snapshot(spark, snapDir).collect()
      .groupBy(_.getString(1))
      .map { case (n, rs) =>
        n -> (rs.length.toLong, rs.map(_.getLong(2)).sum)
      }

  private def applyBoth(batch: org.apache.spark.sql.DataFrame, id: Long,
      snapDir: String, rollDir: String): Unit = {
    assert(RollupSink.applyBatch(batch, id, snapDir, rollDir))
    assert(UpsertSink.applyBatch(batch, id, snapDir))
  }

  test("rollup equals direct recompute after every batch, through migration and deletes") {
    val snapDir = tmp("graft-roll-snap")
    val rollDir = tmp("graft-roll-roll")

    // batch 0: two groups
    applyBoth(changes(
      (1L, "alpha", 100L, false, at("10:00")),
      (2L, "alpha", 50L, false, at("10:00")),
      (3L, "beta", 10L, false, at("10:00"))), 0L, snapDir, rollDir)
    assert(rollupMap(rollDir) == directOfSnapshot(snapDir))
    assert(rollupMap(rollDir) == Map("alpha" -> (2L, 150L), "beta" -> (1L, 10L)))

    // batch 1: accumulation + GROUP MIGRATION (key 2 alpha -> beta) +
    // an insert into a brand-new group
    applyBoth(changes(
      (1L, "alpha", 25L, false, at("11:00")),
      (2L, "beta", 0L, false, at("11:00")),
      (4L, "gamma", 7L, false, at("11:00"))), 1L, snapDir, rollDir)
    assert(rollupMap(rollDir) == directOfSnapshot(snapDir))
    assert(rollupMap(rollDir) == Map(
      "alpha" -> (1L, 125L), "beta" -> (2L, 60L), "gamma" -> (1L, 7L)))

    // batch 2: tombstones erase gamma entirely (group drops out) and
    // shrink beta; exact-cents cancellation is what lets gamma vanish
    applyBoth(changes(
      (4L, "gamma", 0L, true, at("12:00")),
      (3L, "beta", 0L, true, at("12:00"))), 2L, snapDir, rollDir)
    assert(rollupMap(rollDir) == directOfSnapshot(snapDir))
    assert(rollupMap(rollDir) == Map("alpha" -> (1L, 125L), "beta" -> (1L, 50L)))
    assert(!rollupMap(rollDir).contains("gamma"))
  }

  test("replay seams: plain redelivery and the snapshot-committed/rollup-not window") {
    val snapDir = tmp("graft-roll2-snap")
    val rollDir = tmp("graft-roll2-roll")
    val b0 = changes((1L, "alpha", 100L, false, at("10:00")))
    applyBoth(b0, 0L, snapDir, rollDir)

    // plain redelivery: both sinks refuse, state unchanged
    assert(!RollupSink.applyBatch(b0, 0L, snapDir, rollDir))
    assert(rollupMap(rollDir) == Map("alpha" -> (1L, 100L)))

    // crash window: the SNAPSHOT sink commits batch 1, the rollup sink
    // crashes before applying it. On redelivery the rollup must diff
    // against the PRE-batch snapshot version (v=0), not the pointer
    // (v=1) — using the pointer would double-subtract key 1's new value
    val b1 = changes((1L, "alpha", 25L, false, at("11:00")))
    assert(UpsertSink.applyBatch(b1, 1L, snapDir))
    assert(RollupSink.applyBatch(b1, 1L, snapDir, rollDir))
    assert(rollupMap(rollDir) == directOfSnapshot(snapDir))
    assert(rollupMap(rollDir) == Map("alpha" -> (1L, 125L)))
  }

  test("a vacuumed pre-batch snapshot version fails loudly, not silently") {
    val snapDir = tmp("graft-roll3-snap")
    val rollDir = tmp("graft-roll3-roll")

    // batch-0 crash window (UpsertSink committed v=0, rollup has not run)
    // must still work: the pre-batch snapshot is GENUINELY empty there
    val b0 = changes((1L, "alpha", 100L, false, at("10:00")))
    assert(UpsertSink.applyBatch(b0, 0L, snapDir))
    assert(RollupSink.applyBatch(b0, 0L, snapDir, rollDir))
    assert(rollupMap(rollDir) == Map("alpha" -> (1L, 100L)))

    // violate the keep >= 2 vacuum contract: remove v=0 while the
    // rollup has not applied batch 1 yet. The empty-snapshot fallback
    // would zero the minus side (alpha would read 225 instead of 125);
    // the sink must refuse instead.
    assert(UpsertSink.applyBatch(
      changes((1L, "alpha", 25L, false, at("11:00"))), 1L, snapDir))
    val v0 = java.nio.file.Paths.get(snapDir, "v=0")
    Option(v0.toFile.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    java.nio.file.Files.delete(v0)
    val e = intercept[IllegalStateException] {
      RollupSink.applyBatch(
        changes((1L, "alpha", 25L, false, at("11:00"))), 1L, snapDir, rollDir)
    }
    assert(e.getMessage.contains("vacuum"))
    // and the rollup state is untouched by the refused batch
    assert(rollupMap(rollDir) == Map("alpha" -> (1L, 100L)))
  }

  test("attach: engine restart from checkpoint keeps rollup == direct recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val snapDir = tmp("graft-roll3-snap")
    val rollDir = tmp("graft-roll3-roll")
    val ckpt = tmp("graft-roll3-ckpt")
    val stream = MemoryStream[(Long, String, Long, Boolean, Timestamp)]
    def start() = RollupSink.attach(
      stream.toDF().toDF("key", "name", "delta_cents", "deleted", "ts"),
      snapDir, rollDir, ckpt)

    val q1 = start()
    try {
      stream.addData((1L, "alpha", 100L, false, at("10:00")),
        (2L, "beta", 30L, false, at("10:00")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(rollupMap(rollDir) == directOfSnapshot(snapDir))

    // queued while down, delivered once after restart; the migration and
    // the tombstone ride the same post-restart batch
    stream.addData((1L, "beta", 5L, false, at("11:00")),
      (2L, "beta", 0L, true, at("11:00")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rollupMap(rollDir) == directOfSnapshot(snapDir))
    assert(rollupMap(rollDir) == Map("beta" -> (1L, 105L)))
  }
}
