package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since the
  * previous event of the same key exceeds `gapSeconds`.
  *
  * One shuffle on the key, one within-partition sort; session ids come from
  * a running sum over the new-session indicator — the standard scalable
  * sessionize (no self-joins, no state explosion). The streaming twin lives
  * in `graft.streaming.EventStream`.
  */
object Sessionize {

  /** @return input plus `session_id` (per-key ordinal starting at 1). */
  def byGap(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long
  ): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val epoch = unix_timestamp(col(tsCol).cast("timestamp"))
    val prev = lag(epoch, 1).over(byKey)
    val newSession =
      when(prev.isNull || (epoch - prev) > gapSeconds, 1).otherwise(0)
    graft.InternalCols.requireAbsent(df, "byGap", "__new", "session_id")
    df.withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Session stats via Spark's native `session_window` aggregate — the
    * same gap semantics as [[byGap]] (an event exactly `gapSeconds` after
    * its predecessor still merges; only strictly-greater gaps split —
    * boundary equivalence asserted in the spec) expressed as a merging
    * window aggregation instead of a lag/running-sum sweep. One shuffle,
    * no sort window; also the form that transfers directly to Structured
    * Streaming (`session_window` + watermark). */
  def bySessionWindow(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long
  ): DataFrame =
    df.groupBy(col(keyCol),
      session_window(col(tsCol).cast("timestamp"), s"$gapSeconds seconds").as("w"))
      .agg(
        min(unix_timestamp(col(tsCol).cast("timestamp"))).as("start_epoch"),
        max(unix_timestamp(col(tsCol).cast("timestamp"))).as("end_epoch"),
        count(lit(1)).as("n_events"))
      .drop("w")

  /** Per-session rollup: bounds, event count, value sum. Pass an
    * integer-typed `valueCol` (e.g. pre-converted cents) when the sum must
    * be bit-stable across partition orders — float sums are not
    * reassociable. */
  def sessionStats(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      gapSeconds: Long
  ): DataFrame =
    byGap(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(unix_timestamp(col(tsCol).cast("timestamp"))).as("start_epoch"),
        max(unix_timestamp(col(tsCol).cast("timestamp"))).as("end_epoch"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
}
