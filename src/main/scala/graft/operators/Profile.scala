package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: the "what is in this table" pass that precedes any
  * export or training run. One job computes every column's stats
  * simultaneously (a single aggregation over the scan — not one pass per
  * column).
  */
object Profile {

  /** Per-column row/null/distinct counts as rows of
    * (column, n_rows, n_nulls, n_distinct). Exact counts → oracle-safe. */
  def nullsAndDistinct(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"))
    }
    wide.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }

  /** Scale-path profiling: identical output shape to [[nullsAndDistinct]]
    * but with `approx_count_distinct` (HyperLogLog++) instead of exact
    * `countDistinct`.
    *
    * Exact multi-column countDistinct compiles to an `Expand` node that
    * multiplies every scanned row ×(n_cols+1) before aggregation — on a
    * 100 TB, 300-column table that is a 301× row blowup. The HLL sketch
    * variant is one pass with no Expand (each sketch is a fixed-width
    * buffer merged map-side), the only profiling default that survives
    * wide tables at scale; `rsd` trades sketch size for accuracy. */
  def nullsAndDistinctApprox(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"))
    }
    wide.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }

  /** One-pass numeric summary at scale — min/max/mean + approximate
    * quantiles (KLL-style sketch via `percentile_approx`) for every listed
    * column simultaneously. The exact `percentile` aggregate buffers every
    * value per group, which a 100 TB column cannot do; the sketch is
    * fixed-size and merges map-side. Output: one row per column
    * (column, min, max, mean, p50, p90, p99). */
  def numericSummaryApprox(
      df: DataFrame,
      cols: Seq[String],
      accuracy: Int = 10000
  ): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        avg(col(c)).as(s"__avg_$c"),
        percentile_approx(col(c),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy))
          .as(s"__q_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"),
        col(s"__avg_$c").as("mean"),
        element_at(col(s"__q_$c"), 1).cast("double").as("p50"),
        element_at(col(s"__q_$c"), 2).cast("double").as("p90"),
        element_at(col(s"__q_$c"), 3).cast("double").as("p99"))
    }
    wide.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.min"), col("p.max"), col("p.mean"),
        col("p.p50"), col("p.p90"), col("p.p99"))
  }
}
