package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: correlate two event streams on a key
  * within a bounded event-time window — e.g. purchases attributed to a
  * click by the same user within the preceding hour.
  *
  * Both sides carry watermarks so Spark can bound the join state: a left
  * row can stop waiting once the right watermark passes
  * `leftTs + maxDelay`, and vice versa. Works identically on static
  * frames (where it degrades to a plain range join) — which is how the
  * spec pins the semantics.
  */
object StreamJoin {

  /** @param left      stream with columns (key, ts, ...), watermarked by caller
    * @param right     stream with columns (key, ts, ...), watermarked by caller
    * @param leftKey   join key column name on the left
    * @param rightKey  join key column name on the right
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param maxDelaySeconds right row must land in
    *                  `[leftTs, leftTs + maxDelaySeconds]`
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      maxDelaySeconds: Long
  ): DataFrame =
    left.join(right,
      left(leftKey) === right(rightKey) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $maxDelaySeconds SECONDS"))
}
