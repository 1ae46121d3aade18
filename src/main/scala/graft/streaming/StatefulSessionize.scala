package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based session assignment with
  * `flatMapGroupsWithState` over a `KeyValueGroupedDataset` — the
  * Structured Streaming shape for state the built-in windowed aggregations
  * can't express. Runs identically on a static Dataset (single mega-batch),
  * which is how the spec pins it against the window-based batch
  * sessionizer.
  */
object StatefulSessionize {

  /** One input event. */
  final case class EventIn(user_id: Long, ts_epoch: Long)

  /** Per-user running state: last event time + current session ordinal. */
  final case class SessionState(lastTs: Long, sessionId: Long)

  /** One output row per event: its assigned session. */
  final case class SessionUpdate(user_id: Long, session_id: Long, ts_epoch: Long)

  /** A timestamped input event for the watermark-closed variant. */
  final case class TsEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Open-session state for [[closedSessions]]. */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** A session emitted once it can no longer grow. */
  final case class ClosedSession(
      user_id: Long, start_epoch: Long, end_epoch: Long, n_events: Long)

  /** Watermark-closed sessionization: sessions are emitted exactly once —
    * either when a same-key event arrives past the gap, or when the event-
    * time watermark passes `last + gap` (GroupStateTimeout.EventTimeTimeout)
    * so idle keys don't hold state forever. Append output mode: safe for
    * exactly-once sinks. This is the production streaming shape; the
    * Update-mode [[assign]] is the batch-equivalent one. */
  def closedSessions(
      events: Dataset[TsEvent],
      gapSeconds: Long,
      watermarkDelay: String = "0 seconds"
  ): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[TsEvent],
         state: org.apache.spark.sql.streaming.GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.start, s.last, s.n))
          } else {
            val times = evs.map(_.ts.getTime / 1000).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var open = state.getOption
            times.foreach { t =>
              open = open match {
                case Some(s) if t - s.last <= gapSeconds =>
                  Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(uid, s.start, s.last, s.n)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                (s.last + gapSeconds) * 1000 + 1))
            }
            closed.reverse.iterator
          }
      }
  }

  /** Assign gap-based session ids statefully. Within a batch, events are
    * time-ordered per key before state advances (cross-batch order is the
    * stream's arrival order, as with any state op without event-time
    * buffering). */
  def assign(
      events: Dataset[EventIn],
      gapSeconds: Long
  ): Dataset[SessionUpdate] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionUpdate]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[EventIn],
         state: org.apache.spark.sql.streaming.GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts_epoch)
          var (last, sid) = state.getOption
            .map(s => (s.lastTs, s.sessionId))
            .getOrElse((Long.MinValue, 0L))
          val out = sorted.map { e =>
            if (last == Long.MinValue || e.ts_epoch - last > gapSeconds) sid += 1
            last = e.ts_epoch
            SessionUpdate(uid, sid, e.ts_epoch)
          }
          if (sorted.nonEmpty) state.update(SessionState(last, sid))
          out.iterator
      }
  }
}
