package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data skipping.
  *
  * A 1-D sorted layout gives tight parquet min/max statistics on the sort
  * column only — a filter on any other column scans everything. Sorting by
  * the bit-interleaved z-value keeps rows that are close in EVERY indexed
  * dimension close on disk, so each output file covers a small
  * hyper-rectangle and scans filtering on any indexed column (or any
  * combination) skip most files. The standard lake-layout answer to
  * multi-predicate scans over data too high-cardinality for hive
  * partitioning (Delta/Iceberg expose the same idea as OPTIMIZE ZORDER).
  *
  * Everything here is composed from built-in bitwise/arithmetic functions —
  * fully codegen'd column expressions, no UDF.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit `i` of column `c`
    * lands at z-bit `i * n + c` (column 0 contributes the least
    * significant bit of each group). Inputs must already be non-negative
    * and < 2^bits — see [[normalize]] for arbitrary ranges. `bits * n`
    * must fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * n <= 62, s"bits * cols must be <= 62 (got ${bits * n})")
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(c.cast("long").bitwiseAND(lit(1L << i)), i * (n - 1) + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale a column with known [min, max] onto [0, 2^bits): the rank-free
    * normalization for z-ordering (one cheap min/max agg upstream instead
    * of a corpus-wide rank shuffle). Constant columns map to 0. */
  def normalize(c: Column, min: Column, max: Column, bits: Int): Column = {
    val span = max.cast("double") - min.cast("double")
    val top = (1L << bits) - 1
    when(span <= 0.0, lit(0L)).otherwise(
      floor((c.cast("double") - min.cast("double")) / span * top).cast("long"))
  }
}
