package graft

import org.apache.spark.sql.DataFrame

/** Guard for operators that materialize internal helper columns (`__bucket`,
  * `__z`, `__vh`, …) on USER-SUPPLIED frames: if the input already carries
  * one of those names the operator would either hit an ambiguous-attribute
  * analysis error or — worse — silently drop the user's column in its
  * cleanup `drop(...)`. Failing fast with the operator's name and the
  * colliding column beats both. Operators whose helper columns live only on
  * internally-selected projections (where the full column set is known)
  * don't need this. */
private[graft] object InternalCols {
  def requireAbsent(df: DataFrame, op: String, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op uses internal column name(s) ${clash.mkString(", ")} but the " +
        "input frame already has a column with that name — rename it " +
        "(e.g. .withColumnRenamed) before calling")
  }
}
