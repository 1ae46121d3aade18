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
    * with both sides' columns.
    *
    * Build side: by default the binned intervals are explicitly
    * `broadcast()`. Left to Catalyst, size estimates after the explode can
    * flip the broadcast onto the points side — fine at test scale, fatal
    * when points are the corpus. The intervals side is small by
    * construction (bounded fan-out of an enumerable dimension), so it is
    * the build side. Set `broadcastIntervals = false` when the exploded
    * intervals genuinely exceed broadcast size: the fallback shuffles on
    * (bucket, salt) instead of bucket alone, because the day-bucket key is
    * calendar-bounded (~365 distinct values per year of data) and would
    * otherwise land the whole corpus on a handful of tasks. */
  def overlapJoin(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketDays: Int = 1,
      broadcastIntervals: Boolean = true,
      numSalts: Int = 16): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1 (got $bucketDays)")
    require(numSalts >= 1, s"numSalts must be >= 1 (got $numSalts)")
    graft.InternalCols.requireAbsent(points, "IntervalJoin.overlapJoin", "__bucket", "__salt")
    graft.InternalCols.requireAbsent(intervals, "IntervalJoin.overlapJoin", "__bucket", "__salt")
    def bucketOf(c: Column): Column =
      floor(unix_date(to_date(c)) / bucketDays)
    val binned = intervals.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    // residual: bucket equality is necessary, containment is the contract
    val residual = col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol)
    val pts = points.withColumn("__bucket", bucketOf(col(tsCol)))
    if (broadcastIntervals) {
      pts.join(broadcast(binned), "__bucket").filter(residual).drop("__bucket")
    } else {
      // Salted shuffle: replicate each interval bucket across numSalts
      // sub-keys, spread points uniformly over them, join on both. The
      // per-task share of a hot day becomes 1/numSalts of it. The
      // shuffle_hash hint keeps the build on the replicated-intervals side
      // even when size estimates would otherwise broadcast the points.
      val replicated = binned.withColumn(
        "__salt", explode(sequence(lit(0), lit(numSalts - 1))))
        .hint("shuffle_hash")
      val salted = pts.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts))
          .cast("int"))
      salted.join(replicated, Seq("__bucket", "__salt"))
        .filter(residual)
        .drop("__bucket", "__salt")
    }
  }

  /** Eager-aggregated interval join: for consumers that aggregate the
    * joined rows per interval with DECOMPOSABLE aggregates (sum / count /
    * min / max), aggregate the points per distinct `tsCol` value FIRST and
    * join the per-value partials to the intervals instead of the raw
    * points. A point-in-interval join is intrinsically many-to-many — at
    * 20× test scale every in-window event already matches hundreds of
    * covering intervals, and at 100 TB the join output (|points| × avg
    * covering intervals) dwarfs both inputs — but when the final shape is
    * `GROUP BY interval`, all points sharing a timestamp contribute
    * identically, so the join only ever needs |distinct ts| partial rows
    * (for date-granularity attribution: a few hundred). The classic
    * eager-aggregation rewrite, applied where Catalyst cannot prove it.
    *
    * `partialAggs` aggregate the point columns per `tsCol` value (alias
    * them); `finalAggs` combine those partials per `groupCols` (sum of
    * counts, sum of sums, min of mins, ...). Result is identical to
    * `overlapJoin(...).groupBy(groupCols).agg(...)` for decomposable
    * aggregates — spec-verified — at a fraction of the exchange. */
  def overlapAggregate(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      groupCols: Seq[String],
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      bucketDays: Int = 1,
      broadcastIntervals: Boolean = true,
      numSalts: Int = 16): DataFrame = {
    require(groupCols.nonEmpty && partialAggs.nonEmpty && finalAggs.nonEmpty,
      "overlapAggregate needs group columns and both aggregate stages")
    val perTs = points.groupBy(col(tsCol))
      .agg(partialAggs.head, partialAggs.tail: _*)
    overlapJoin(perTs, intervals, tsCol, startCol, endCol,
      bucketDays, broadcastIntervals, numSalts)
      .groupBy(groupCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
