package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** A declarative export/query plan over a single table.
  *
  * Re-expresses the reference's shared SQL planner
  * (db2pq/postgres/select_sql.py:158 plan_wrds_query /
  * select_sql.py:107 build_wrds_select_sql) as a Spark logical-plan builder:
  * the same `TablePlan` value can be applied to any DataFrame (parquet, JDBC,
  * stream) — Catalyst then pushes the projection and filter into the scan —
  * or rendered as a PostgreSQL SELECT for JDBC-side pushdown where we want
  * the *database* to do the pruning before bytes hit the wire.
  *
  * Stage order matches SQL semantics in the reference: WHERE sees source
  * column names; casts/renames happen in the projection; LIMIT last.
  *
  * @param keep     regex patterns of source columns to keep (applied second)
  * @param drop     regex patterns of source columns to drop (applied first)
  * @param rename   source column -> output column mapping
  * @param colTypes output column -> target type (aliases normalized; a
  *                 boolean target uses the null-safe boolean cast)
  * @param where    SQL filter over *source* columns
  * @param obs      row limit (reference `obs`, SQL LIMIT)
  * @param tz       time zone assumed for naive (NTZ) timestamp columns before
  *                 normalizing to UTC instants (reference `tz` / AT TIME ZONE,
  *                 select_sql.py:139)
  * @param numericMode handling for decimal (NUMERIC) source columns not
  *                 covered by an explicit colTypes entry: "text" casts to
  *                 string, "float64" to double, "decimal"/None keeps the
  *                 native decimal (reference numeric_mode, core.py:8,
  *                 duckdb_pg.py:80 _merge_duckdb_col_types)
  */
final case class TablePlan(
    keep: Seq[String] = Nil,
    drop: Seq[String] = Nil,
    rename: Map[String, String] = Map.empty,
    colTypes: Map[String, String] = Map.empty,
    where: Option[String] = None,
    obs: Option[Long] = None,
    tz: Option[String] = Some("UTC"),
    numericMode: Option[String] = None
) {

  require(
    numericMode.forall(Set("text", "float64", "decimal")),
    "numeric_mode must be one of 'text', 'float64', or 'decimal'")

  /** colTypes with numericMode folded in for the given decimal source
    * columns (explicit colTypes entries take precedence). */
  private def effectiveColTypes(decimalSources: Set[String]): Map[String, String] = {
    val modeCasts = numericMode match {
      case Some("text")    => Some("string")
      case Some("float64") => Some("double")
      case _               => None
    }
    modeCasts.fold(colTypes) { target =>
      val extra = decimalSources
        .map(c => rename.getOrElse(c, c))
        .filterNot(colTypes.contains)
        .map(_ -> target)
      colTypes ++ extra
    }
  }

  /** Source columns selected from `allCols`, in source order. */
  def sourceColumns(allCols: Seq[String]): Seq[String] =
    ColumnFilter.select(allCols, keep = keep, drop = drop)

  /** Output (post-rename) columns; rejects duplicate outputs
    * (reference _resolve_output_columns, select_sql.py:68-86). */
  def outputColumns(allCols: Seq[String]): Seq[String] = {
    val outs = sourceColumns(allCols).map(c => rename.getOrElse(c, c))
    val dups = outs.groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"rename would create duplicate output columns: ${dups.toSeq.sorted.mkString(", ")}")
    outs
  }

  /** colTypes keys must name selected output columns
    * (reference _normalize_output_col_types, select_sql.py:89-105). */
  private def validateColTypes(
      allCols: Seq[String],
      types: Map[String, String]): Map[String, String] = {
    val outs = outputColumns(allCols).toSet
    val unknown = types.keySet.diff(outs)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        "col_types keys must refer to selected output columns after rename: " +
          unknown.toSeq.sorted.mkString(", "))
    Types.normalizeColTypes(types)
  }

  /** Null-safe boolean cast: normalizes common numeric/text/boolean encodings;
    * unrecognized non-null values become NULL instead of failing
    * (reference _safe_boolean_cast_expr, select_sql.py:55-65).
    * Pure `when` chain — stays inside whole-stage codegen. */
  private def safeBool(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    when(c.isNull, lit(null).cast("boolean"))
      .when(s.isin("t", "true", "y", "yes", "1", "1.0"), lit(true))
      .when(s.isin("f", "false", "n", "no", "0", "0.0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Apply the plan to a DataFrame. Filter first (pushdown), then a single
    * projection doing tz-normalization + casts + renames, then limit. */
  def apply(df: DataFrame): DataFrame = {
    val srcCols = sourceColumns(df.columns.toSeq)
    val outCols = srcCols.map(c => rename.getOrElse(c, c))
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val decimalSources = srcCols
      .filter(c => fieldType(c).isInstanceOf[org.apache.spark.sql.types.DecimalType])
    val types = validateColTypes(df.columns.toSeq,
      effectiveColTypes(decimalSources.toSet))

    val filtered = where.fold(df)(w => df.filter(expr(w)))

    val projection: Seq[Column] = srcCols.zip(outCols).map { case (src, out) =>
      var c = col(src)
      // Naive (NTZ) timestamps: interpret in `tz`, emit UTC instants —
      // the Spark analog of `(col AT TIME ZONE tz)` in the reference.
      // The NTZ→TS cast binds the SESSION zone, so it is undone with
      // from_utc_timestamp(·, current_timezone()) before the `tz`
      // interpretation — a bare to_utc_timestamp(cast(c), z) is only
      // correct when the session zone is UTC (the cast has already
      // shifted the wall clock by the session offset). The cancel pair
      // can disagree only for wall times inside a session-zone DST
      // transition window.
      tz.foreach { z =>
        if (fieldType(src) == TimestampNTZType)
          c = to_utc_timestamp(
            from_utc_timestamp(c.cast(TimestampType), current_timezone()), z)
      }
      types.get(out) match {
        case Some(t) if Types.isBoolean(t) => c = safeBool(c)
        case Some(t)                       => c = c.cast(t)
        case None                          =>
      }
      c.as(out)
    }

    val projected = filtered.select(projection: _*)
    obs.fold(projected) { n =>
      // Dataset.limit takes an Int: a silent Long.toInt would overflow to
      // a negative (AnalysisException) or a SMALLER positive limit,
      // quietly returning fewer rows than the SQL-pushdown rendering of
      // the same plan
      require(n >= 0 && n <= Int.MaxValue,
        s"obs row limit $n outside [0, ${Int.MaxValue}]")
      projected.limit(n.toInt)
    }
  }

  /** Render as a PostgreSQL SELECT for JDBC pushdown, given the source
    * schema. Projection + filter + limit execute inside the database, so a
    * 1000-executor ingest moves only the requested bytes.
    * (Spark-side analog of build_wrds_select_sql, select_sql.py:107-155.) */
  def toSelectSql(schema: String, table: String, sourceSchema: StructType): String = {
    def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def qlit(s: String): String = "'" + s.replace("'", "''") + "'"

    val allCols = sourceSchema.fields.map(_.name).toSeq
    val srcCols = sourceColumns(allCols)
    val outCols = srcCols.map(c => rename.getOrElse(c, c))
    val fieldType = sourceSchema.fields.map(f => f.name -> f.dataType).toMap
    val decimalSources = srcCols
      .filter(c => fieldType(c).isInstanceOf[org.apache.spark.sql.types.DecimalType])
    val types = validateColTypes(allCols, effectiveColTypes(decimalSources.toSet))

    val items = srcCols.zip(outCols).map { case (src, out) =>
      var e = q(src)
      tz.foreach { z =>
        if (fieldType(src) == TimestampNTZType) e = s"($e AT TIME ZONE ${qlit(z)})"
      }
      types.get(out) match {
        case Some(t) if Types.isBoolean(t) =>
          e = "CASE " +
            s"WHEN $e IS NULL THEN NULL " +
            s"WHEN lower(trim(CAST($e AS VARCHAR))) IN ('t','true','y','yes','1','1.0') THEN TRUE " +
            s"WHEN lower(trim(CAST($e AS VARCHAR))) IN ('f','false','n','no','0','0.0') THEN FALSE " +
            "ELSE NULL END"
        case Some(t) => e = s"$e::${Types.toPostgres(t)}"
        case None    =>
      }
      s"$e AS ${q(out)}"
    }

    val base = s"SELECT ${items.mkString(", ")} FROM ${q(schema)}.${q(table)}"
    val withWhere = where.fold(base)(w => s"$base WHERE $w")
    obs.fold(withWhere)(n => s"$withWhere LIMIT $n")
  }
}
