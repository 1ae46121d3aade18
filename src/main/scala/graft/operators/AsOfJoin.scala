package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — an operator Spark lacks natively.
  *
  * For each left row, attach the payload of the latest right row with the
  * same key and `rightTs <= leftTs` (inclusive). Implemented Spark-first as
  * a union + keyed window sweep instead of a range join: both sides shuffle
  * once on the key, a single within-partition sort orders by time, and
  * `last(payload, ignoreNulls)` carries the most recent right payload
  * forward. No row explosion, no O(left × right-per-key) range probe —
  * the shape that holds at 100 TB with AQE handling key skew.
  */
object AsOfJoin {

  /** @param left      left frame
    * @param right     right frame
    * @param leftKey   join key on the left
    * @param rightKey  join key on the right
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param payloads  right columns to attach (null when no prior right row)
    */
  def nearestPrior(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payloads: Seq[String]
  ): DataFrame =
    sweep(left, right, leftKey, rightKey, leftTs, rightTs, payloads,
      forward = false)

  /** Forward as-of: attach the payload of the EARLIEST right row with
    * `rightTs >= leftTs` (inclusive) — pandas
    * `merge_asof(direction='forward')`, DuckDB `ASOF ... ON l.ts <= r.ts`.
    * Identical single-sweep shape as [[nearestPrior]], with the
    * within-partition sort reversed in time. */
  def nearestFollowing(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payloads: Seq[String]
  ): DataFrame =
    sweep(left, right, leftKey, rightKey, leftTs, rightTs, payloads,
      forward = true)

  private def sweep(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payloads: Seq[String],
      forward: Boolean
  ): DataFrame = {
    val leftCols = left.columns.toSeq

    // Key and ts types unify to the LEFT side's types (no silent bigint
    // cast — string/decimal keys work too).
    val keyType = left.schema(leftKey).dataType
    val tsType = left.schema(leftTs).dataType

    // ALL payloads travel as ONE struct, null only on left rows: the
    // window's last(ignoreNulls) then picks the nearest right ROW
    // atomically. Sweeping each payload column independently would mix
    // columns from different right rows whenever the nearest row carries
    // a NULL payload field (the stale non-null from an older row would
    // win for that field only).
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payloads.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType, nullable = true)))

    val rightSel: Seq[Column] =
      Seq(col(rightKey).cast(keyType).as("__k"),
        col(rightTs).cast(tsType).as("__t"),
        lit(0).as("__side"),
        struct(payloads.map(col): _*).as("__p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    // SQL as-of semantics: a null key or null timestamp satisfies no
    // range predicate, so such right rows can never be a match — without
    // this filter the window's null ordering (nulls FIRST ascending)
    // would attach a null-ts right payload to every left row that has no
    // genuine prior match
    val taggedRight = right.select(rightSel: _*)
      .filter(col("__k").isNotNull && col("__t").isNotNull)

    val leftSel: Seq[Column] =
      Seq(col(leftKey).as("__k"), col(leftTs).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(payloadStructType).as("__p")) ++
        leftCols.map(col)
    val taggedLeft = left.select(leftSel: _*)

    // Rights sort before lefts at equal timestamps → inclusive as-of.
    // Backward sweeps time-ascending (last right seen = latest prior);
    // forward sweeps time-descending (last right seen = earliest
    // following).
    val w = Window.partitionBy("__k")
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val swept = taggedRight.unionByName(taggedLeft)
      .select(
        (col("__side") +: leftCols.map(col)) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__pm"): _*)

    // a left row with a null key or null timestamp matches nothing (same
    // null semantics as the right-side filter; forward mode would
    // otherwise sort null left ts AFTER every right row and hand it the
    // earliest payload)
    val matchable = col(leftKey).isNotNull && col(leftTs).isNotNull
    swept.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloads.map(p =>
          when(matchable, col("__pm").getField(p)).as(p)): _*)
  }

  /** [[nearestPrior]] with a staleness bound — the feature-store contract:
    * a match older than `toleranceSeconds` before the left event is
    * discarded (payloads null), exactly like pandas `merge_asof(...,
    * tolerance=...)`. Implemented by carrying the matched right timestamp
    * through the same single-sweep window, so the bound adds no extra
    * shuffle. `rightTs` must not collide with a left column name. */
  def nearestPriorWithin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payloads: Seq[String],
      toleranceSeconds: Long
  ): DataFrame = {
    require(!left.columns.contains(rightTs),
      s"rightTs '$rightTs' collides with a left column")
    val matched = nearestPrior(left, right, leftKey, rightKey, leftTs, rightTs,
      payloads :+ rightTs)
    val stale =
      unix_timestamp(col(leftTs).cast("timestamp")) -
        unix_timestamp(col(rightTs).cast("timestamp")) > toleranceSeconds
    payloads.foldLeft(matched) { (df, p) =>
      df.withColumn(p, when(stale, lit(null)).otherwise(col(p)))
    }.drop(rightTs)
  }
}
