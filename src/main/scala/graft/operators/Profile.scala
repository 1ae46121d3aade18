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
}
