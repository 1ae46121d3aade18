package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from an event/snapshot log.
  *
  * Collapses each entity's timeline into validity intervals: consecutive
  * observations with identical tracked attributes merge into one row with
  * `valid_from` / `valid_to` (null while current) and a per-entity
  * `version`. The bread-and-butter change-tracking transform for mirrored
  * research tables (the reference workflow re-downloads WRDS snapshots;
  * history building is what users do next in SQL — db2pq/core.py:529).
  *
  * Scale shape: three window functions over the same `(key, order)`
  * partitioning — Catalyst plans ONE shuffle on the entity key and sorts
  * once; no self-join, no collect. Entity timelines are assumed to fit an
  * executor (window semantics) — true for per-entity histories at any
  * realistic cardinality, with entity count unbounded.
  */
object Scd2 {

  /** Build the interval history. `orderCols` breaks timestamp ties
    * deterministically (e.g. an event id). */
  def buildHistory(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String],
      orderCols: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (col(tsCol) +: orderCols.map(col))
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    // run starts where the tracked attributes differ from the previous
    // observation (null-safe, so the first row of each entity starts one)
    val runs = df
      .withColumn("__new_run",
        when(lag(attrs, 1).over(w) <=> attrs, 0L).otherwise(1L))
      .withColumn("__run", sum(col("__new_run")).over(w))
    val byRun = runs
      .groupBy(col(keyCol), col("__run"))
      .agg(
        first(attrs).as("__attrs"),
        min(col(tsCol)).as("valid_from"))
    val wr = Window.partitionBy(keyCol).orderBy(col("__run"))
    byRun
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select(
        col(keyCol) +:
          attrCols.map(c => col("__attrs").getField(c).as(c)) :+
          col("valid_from") :+
          col("valid_to") :+
          col("__run").cast("bigint").as("version"): _*)
  }
}
