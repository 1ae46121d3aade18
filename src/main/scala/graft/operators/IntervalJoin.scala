package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without a cartesian product.
  *
  * Spark turns a raw `l.ts BETWEEN r.start AND r.end` join condition into
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast that
  * falls over once the interval side stops being tiny. This operator bins
  * instead: each interval is exploded into the fixed-width buckets it
  * covers and each point maps to exactly one bucket, so the match becomes
  * a hash equi-join on the bucket id (shuffled or broadcast by Catalyst
  * like any other), followed by the exact residual predicate. An interval
  * of span S days costs ceil(S/bucket)+1 rows in the exchange — bounded
  * fan-out, no cross product anywhere.
  *
  * Reference analog: event-window attribution queries run as post-load SQL
  * (db2pq/core.py:529); first-class here because at 100 TB the nested-loop
  * shape is the difference between minutes and never finishing.
  */
object IntervalJoin {

  /** Join each row of `points` to every row of `intervals` whose closed
    * interval `[startCol, endCol]` contains `tsCol` (ordinary SQL
    * comparison with the usual date/timestamp coercions — pass matching
    * types for exact semantics).
    *
    * `bucketDays` is the bin width in days (pick it near the median
    * interval span: wider means fewer exploded rows, narrower means fewer
    * residual-filter misses). Containment implies the point's date lies
    * within the interval's date range, so day binning never misses a
    * match regardless of the columns' precision. Returns the joined rows
    * with both sides' columns. */
  def overlapJoin(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketDays: Int = 1): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1 (got $bucketDays)")
    graft.InternalCols.requireAbsent(points, "IntervalJoin.overlapJoin", "__bucket")
    graft.InternalCols.requireAbsent(intervals, "IntervalJoin.overlapJoin", "__bucket")
    def bucketOf(c: Column): Column =
      floor(unix_date(to_date(c)) / bucketDays)
    val binned = intervals.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    points
      .withColumn("__bucket", bucketOf(col(tsCol)))
      .join(binned, "__bucket")
      // residual: bucket equality is necessary, containment is the contract
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
