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
