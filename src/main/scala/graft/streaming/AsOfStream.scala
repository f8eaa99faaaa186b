package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the stateful twin of the oracle-gated batch q62
  * (`operators/Events.scala`): every probe event picks up the latest build
  * event by the same user at-or-before its own EVENT time.
  *
  * Processing-order enrichment ("latest build processed so far") would be
  * wrong under reordering: a probe arriving before an earlier-in-event-time
  * build would miss it. This implementation is WATERMARK-correct instead —
  * a probe is answered only once the watermark passes its event time, at
  * which point every build with `build.ts <= probe.ts` has either arrived
  * or is by definition late (outside the `lateness` bound). Out-of-order
  * arrival inside the bound therefore cannot change an emitted answer:
  * emission waits, state buffers.
  *
  * Per-user state is BOUNDED, not a full history:
  *  - pending probes drain as the watermark passes them (and a
  *    [[GroupStateTimeout.EventTimeTimeout]] set to the earliest pending
  *    probe flushes them even if the user never sends another event);
  *  - builds at-or-below the watermark compact to the single dominant one
  *    (max (ts, event_id)) — every future probe has ts above the
  *    watermark, so older builds can never win again. State size is
  *    O(events within the lateness horizon) per user, independent of
  *    stream length.
  *
  * Like [[EventsStream.runningUserTotals]], the USER dimension itself is
  * retained while a probe is pending or a build may still be consulted; a
  * deployment that wants idle users evicted entirely adds a lastSeen TTL
  * exactly as [[DedupStream.nearDupFlags]] does.
  *
  * Ties follow q62: builds at the probe's exact ts qualify, and among
  * builds tied on ts the max event_id wins. AsOfStreamSpec pins parity
  * against the batch q62 formulation on identical data, out-of-order
  * delivery across micro-batches, and the state-compaction bound.
  *
  * Event-time clock contract: Catalyst pushes the type filter BELOW the
  * EventTimeWatermark node, so the watermark advances on probe/build
  * events ONLY — other event types never reach the watermark collector
  * (verified empirically: a 'view' row does not move
  * progress.eventTime.watermark). That is safe (the watermark can only
  * lag the full stream's clock, never lead it) but means a quiet
  * probe/build stream holds answers back; emission additionally requires
  * the probe STRICTLY below the watermark because the engine's late-row
  * boundary keeps rows AT the watermark, so a build tied exactly with it
  * could still arrive.
  */
object AsOfStream {

  /** One buffered build/probe row. us = event time in microseconds. */
  final case class AsOfRow(us: Long, id: Long, value: Double, isBuild: Boolean)

  final case class AsOfState(builds: Seq[(Long, Long, Double)],
      pending: Seq[(Long, Long)])

  final case class AsOfMatch(probe_id: Long, user_id: Long, probe_us: Long,
      match_id: Option[Long], match_value: Option[Double],
      staleness_us: Option[Long])

  // scalastyle:off method.length
  def asOfMatches(
      spark: SparkSession,
      events: DataFrame,
      probeType: String = "click",
      buildType: String = "purchase",
      lateness: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .filter(col("event_type").isin(probeType, buildType))
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id").cast("long").as("id"),
        col("value").cast("double").as("value"),
        (col("event_type") === buildType).as("isBuild"), col("ts"))
      .as[(Long, Long, Long, Double, Boolean, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double, Boolean, Timestamp)],
         state: GroupState[AsOfState]) =>
          val prior = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val fresh = rows.map(r => AsOfRow(r._2, r._3, r._4, r._5)).toSeq
          val builds = (prior.builds ++
            fresh.filter(_.isBuild).map(b => (b.us, b.id, b.value))).distinct
          val pending = (prior.pending ++
            fresh.filter(!_.isBuild).map(p => (p.us, p.id))).distinct
          // watermark: everything strictly below is complete — answer it
          // (rows AT the watermark are not late yet; a tied build could
          // still arrive, so an equal-ts probe waits one more advance)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, stillPending) = pending.partition(_._1 < wmUs)
          val out = ripe.sortBy(p => (p._1, p._2)).map { case (pUs, pId) =>
            val cand = builds.filter(_._1 <= pUs)
            val best = if (cand.isEmpty) None else Some(cand.maxBy(b => (b._1, b._2)))
            AsOfMatch(pId, user, pUs, best.map(_._2), best.map(_._3),
              best.map(b => pUs - b._1))
          }
          // compact: below the watermark only the dominant build can ever
          // be an answer again (future probes sit above the watermark)
          val (old, recent) = builds.partition(_._1 <= wmUs)
          val kept = (if (old.isEmpty) recent
            else old.maxBy(b => (b._1, b._2)) +: recent).sortBy(b => (b._1, b._2))
          if (kept.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(AsOfState(kept, stillPending))
            // flush pending probes when the watermark passes them even if
            // this user never sends again; all remaining pending sit above
            // the current watermark, so the timestamp is legal
            stillPending.map(_._1).minOption.foreach { minUs =>
              state.setTimeoutTimestamp(minUs / 1000L + 1L)
            }
          }
          out.iterator
      }
      .toDF()
  }
  // scalastyle:on method.length
}
