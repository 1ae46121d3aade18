package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming per-window top-k — "what dominated each hour", emitted
  * exactly once per window when the event-time watermark passes the
  * window end.
  *
  * Built-in streaming aggregation can count per (window, key) but cannot
  * RANK within a window in Append mode (the rank needs every key of the
  * window, which is only knowable when the window closes). So this is a
  * `flatMapGroupsWithState` operator keyed by window start: state is the
  * per-key count map (bounded by the key cardinality, not the event
  * count), and emission happens solely on EventTimeTimeout — i.e. when
  * the watermark proves the window can no longer change. Append output:
  * safe for exactly-once sinks.
  *
  * [[topKBatch]] is the batch twin (same window/rank semantics on a
  * static frame) — the DuckDB-oracle hook; StreamTopKSpec proves the
  * multi-batch streaming run emits exactly the batch twin's rows for
  * every closed window.
  *
  * Late-data caveat (the standard arbitrary-stateful one, same as
  * [[StreamDedup]]'s re-emission note): an event arriving for a window
  * AFTER its watermark close re-opens that window's state and a
  * supplemental top-k (over the late events only) is emitted at the next
  * close. Size `watermarkDelay` to the source's real lateness, or have
  * the sink collapse duplicates by `(window_start, rank)` — the repo
  * compaction pass does exactly that.
  */
object StreamTopK {

  /** One typed input event. */
  final case class TypedEvent(event_type: String, ts: java.sql.Timestamp)

  /** Per-window state: counts per key. */
  final case class WindowCounts(counts: Map[String, Long])

  /** One ranked output row, emitted when the window closes. */
  final case class TopEntry(window_start: Long, event_type: String, n: Long, rank: Int)

  /** Streaming top-`k` event types per `windowSeconds` tumbling window.
    *
    * `maxKeysPerWindow` bounds the per-window state map in KEY CARDINALITY
    * (the event count never mattered — counts are longs). Below the cap
    * the operator is exact. At the cap it degrades to the space-saving
    * summary (Metwally et al., ICDT 2005): an unseen key evicts the
    * current minimum-count entry and inherits its count + 1. The classic
    * guarantees hold — any key whose true count exceeds `events/cap` is
    * retained, and a skewed stream's genuine heavy hitters keep exact
    * counts as long as they stay above the eviction floor — which is
    * precisely the top-k question the operator answers. The default cap
    * (100k keys ≈ a few MB of state per open window) is far above any
    * enumerable event-type domain, so ordinary use never trips it; it
    * exists so a high-cardinality key column (user ids, URLs) degrades to
    * a bounded approximate summary instead of growing state without
    * limit. */
  def topKPerWindow(
      events: Dataset[TypedEvent],
      windowSeconds: Long,
      k: Int,
      watermarkDelay: String = "0 seconds",
      maxKeysPerWindow: Int = 100000
  ): Dataset[TopEntry] = {
    require(maxKeysPerWindow > 0, "maxKeysPerWindow must be positive")
    implicit val stateEnc = Encoders.product[WindowCounts]
    implicit val outEnc = Encoders.product[TopEntry]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      // floorDiv at BOTH steps: plain `/ 1000` truncates toward zero, so a
      // sub-second pre-epoch timestamp would land one window late and
      // diverge from topKBatch's window()
      .groupByKey(e => math.floorDiv(
        math.floorDiv(e.ts.getTime, 1000L), windowSeconds) * windowSeconds)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstart: Long, evs: Iterator[TypedEvent],
         state: org.apache.spark.sql.streaming.GroupState[WindowCounts]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            rankCounts(wstart, counts, k)
          } else {
            // space-saving eviction via a lazy-deletion min-heap: a
            // per-eviction minBy scan of the full map made the
            // over-the-cap regime — the exact one the cap exists for —
            // O(cap) per unseen key (quadratic per batch). Snapshots go
            // stale when a key's count moves; per-key counts only grow
            // (an evicted key re-enters above its old count), so a
            // snapshot matching the live map IS the current minimum.
            // Victim order unchanged: smallest count, largest key on ties.
            val victimOrd = Ordering.Tuple2(Ordering.Long, Ordering.String.reverse)
            val m = scala.collection.mutable.HashMap.empty[String, Long]
            state.getOption.foreach(_.counts.foreach { case (key, n) => m(key) = n })
            val heap = scala.collection.mutable.PriorityQueue
              .empty[(Long, String)](victimOrd.reverse)
            m.foreach { case (key, n) => heap.enqueue((n, key)) }
            evs.foreach { e =>
              val key = e.event_type
              m.get(key) match {
                case Some(n) =>
                  m(key) = n + 1L; heap.enqueue((n + 1L, key))
                case None if m.size < maxKeysPerWindow =>
                  m(key) = 1L; heap.enqueue((1L, key))
                case None =>
                  var victim: (Long, String) = null
                  while (victim == null) {
                    val c = heap.dequeue()
                    if (m.get(c._2).contains(c._1)) victim = c
                  }
                  m -= victim._2
                  m(key) = victim._1 + 1L
                  heap.enqueue((victim._1 + 1L, key))
              }
            }
            state.update(WindowCounts(m.toMap))
            // fire when the watermark passes the window end (strictly
            // after, so an on-time event at end-1s still lands first)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              (wstart + windowSeconds) * 1000))
            Iterator.empty
          }
      }
  }

  /** Deterministic rank: count desc, then key asc. */
  private def rankCounts(
      wstart: Long, counts: Map[String, Long], k: Int): Iterator[TopEntry] =
    counts.toSeq
      .sortBy { case (key, n) => (-n, key) }
      .take(k)
      .zipWithIndex
      .map { case ((key, n), i) => TopEntry(wstart, key, n, i + 1) }
      .iterator

  /** Batch twin on a static frame — identical window/rank semantics, the
    * oracle target. Output: (window_start epoch, event_type, n, rank). */
  def topKBatch(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      windowSeconds: Long,
      k: Int
  ): DataFrame = {
    val w = Window.partitionBy("ws")
      .orderBy(col("n").desc, col(typeCol).asc)
    events
      .groupBy(window(col(tsCol).cast("timestamp"), s"$windowSeconds seconds")
        .as("wdw"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("wdw.start")).as("ws"), col(typeCol), col("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("ws").as("window_start"), col(typeCol).as("event_type"),
        col("n"), col("rank"))
  }
}
