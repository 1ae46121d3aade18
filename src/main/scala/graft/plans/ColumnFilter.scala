package graft.plans

import scala.util.matching.Regex

/** Regex-based column selection.
  *
  * Semantics follow the reference (db2pq/postgres/column_filter.py:29-49):
  *   - `drop` patterns are applied first, `keep` second;
  *   - patterns match anywhere in the column name (search, not full match);
  *   - selecting zero columns is an error.
  *
  * On Spark this drives `df.select(...)`, so the narrowed schema reaches the
  * parquet/JDBC scan as column pruning — at 100 TB this is the difference
  * between reading 3 columns and 30.
  */
object ColumnFilter {

  private def compile(patterns: Seq[String], argName: String): Seq[Regex] =
    patterns.map { p =>
      try p.r
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          throw new IllegalArgumentException(s"Invalid regex in $argName: '$p'", e)
      }
    }

  /** Filter `allCols` keeping order, applying `drop` then `keep`. */
  def select(
      allCols: Seq[String],
      keep: Seq[String] = Nil,
      drop: Seq[String] = Nil
  ): Seq[String] = {
    val dropRes = compile(drop, "drop")
    val keepRes = compile(keep, "keep")

    var cols = allCols
    if (dropRes.nonEmpty)
      cols = cols.filterNot(c => dropRes.exists(_.findFirstIn(c).isDefined))
    if (keepRes.nonEmpty)
      cols = cols.filter(c => keepRes.exists(_.findFirstIn(c).isDefined))

    if (cols.isEmpty)
      throw new IllegalArgumentException(
        "No columns selected after applying keep/drop filters")
    cols
  }
}
