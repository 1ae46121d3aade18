package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.plans.{TablePlan, Types}

/** JDBC ingest/egress builders — the database-to-parquet path.
  *
  * Re-expresses the reference's engine layer (db2pq/postgres/duckdb_pg.py,
  * adbc.py, core.py:43 db_to_pq) Spark-first: instead of a single streaming
  * connection, the planned SELECT is pushed into the database as a subquery
  * and the read fans out across executors via `partitionColumn` stride —
  * the scale path for 100 TB ingest that a single-node engine cannot take.
  *
  * There is no live PostgreSQL in CI, so these builders are unit-tested at
  * the plan/SQL level (see JdbcSpec); the run-time calls are thin wrappers
  * over `spark.read.jdbc` / `df.write.jdbc`.
  */
object Jdbc {

  /** The planned SELECT wrapped for use as a JDBC `dbtable` subquery. */
  def pushdownSubquery(
      plan: TablePlan,
      schema: String,
      table: String,
      sourceSchema: StructType
  ): String =
    s"(${plan.toSelectSql(schema, table, sourceSchema)}) AS graft_sub"

  /** Read a table with the plan pushed down into the database.
    *
    * @param partitionColumn numeric/date column to stride on; with
    *   `lowerBound`/`upperBound`/`numPartitions` the read issues
    *   `numPartitions` parallel range queries (Spark's JDBC partitioning).
    */
  def readTable(
      spark: SparkSession,
      url: String,
      plan: TablePlan,
      schema: String,
      table: String,
      sourceSchema: StructType,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 32,
      properties: java.util.Properties = new java.util.Properties()
  ): DataFrame = {
    val reader = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", pushdownSubquery(plan, schema, table, sourceSchema))
      .option("fetchsize", adaptiveFetchSize(sourceSchema).toString)
    val partitioned = (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        reader
          .option("partitionColumn", c)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case (None, None, None) => reader
      case _ =>
        // a partial spec must not silently degrade the fan-out to one
        // unpartitioned stream — at scale that is a multi-hour single-
        // executor ingest with nothing telling the caller why
        throw new IllegalArgumentException(
          "readTable partitioning needs partitionColumn, lowerBound AND " +
            "upperBound together (got " +
            s"partitionColumn=$partitionColumn lowerBound=$lowerBound " +
            s"upperBound=$upperBound); use readTableSkewBalanced or " +
            "readTablePredicates when bounds are unknown")
    }
    val props = new java.util.Properties()
    props.putAll(properties)
    props.asInstanceOf[java.util.Hashtable[AnyRef, AnyRef]]
      .forEach((k, v) => partitioned.option(k.toString, v.toString))
    partitioned.load()
  }

  /** Partitioned read via explicit predicates — the fan-out for tables
    * with no numeric stride column (string/composite keys): each predicate
    * becomes one partition's WHERE clause, so `predicates.length` parallel
    * range-free queries run against the database. Caller guarantees the
    * predicates are disjoint and covering (e.g. `MOD(hash, k) = i`, date
    * buckets, key prefixes). The planned SELECT still pushes down. */
  def readTablePredicates(
      spark: SparkSession,
      url: String,
      plan: TablePlan,
      schema: String,
      table: String,
      sourceSchema: StructType,
      predicates: Seq[String],
      properties: java.util.Properties = new java.util.Properties()
  ): DataFrame = {
    val props = new java.util.Properties()
    props.putAll(properties)
    if (props.getProperty("fetchsize") == null)
      props.setProperty("fetchsize", adaptiveFetchSize(sourceSchema).toString)
    spark.read.jdbc(url,
      pushdownSubquery(plan, schema, table, sourceSchema),
      predicates.toArray, props)
  }

  /** Quantile-probed range predicates for a skew-resistant partitioned
    * read.
    *
    * Spark's lowerBound/upperBound stride cuts the ID RANGE into equal
    * widths — on a mostly-deleted or hotspotted id column (every aged
    * production table) one stripe then holds most of the rows and its
    * task becomes the straggler that gates the whole ingest. This probe
    * asks the database for the column's actual row-count quantiles and
    * cuts there instead, so every partition carries ~rows/numPartitions
    * regardless of how the ids are distributed.
    *
    * Probe cost by dialect: on engines with ordered-set aggregates
    * (PostgreSQL, Oracle, SQL Server) ALL quantiles come back in ONE
    * round trip — `percentile_disc(f_i) WITHIN GROUP (ORDER BY col)`,
    * one aggregation scan server-side. The portable fallback (Derby and
    * anything else) is one COUNT plus `numPartitions - 1` single-row
    * `ORDER BY col OFFSET k ROWS FETCH NEXT 1 ROWS ONLY` lookups
    * (SQL:2008) — fine with a covering index, but each seek is an
    * O(offset) scan without one, and k sequential partial scans of a
    * billion-row table would gate the ingest before it starts; the
    * one-shot path exists precisely for that table.
    * Duplicate boundaries (few distinct values) collapse, so predicates
    * are always disjoint and covering; rows with NULL ids ride in the
    * first partition. Feed the result to [[readTablePredicates]], or call
    * [[readTableSkewBalanced]] which does both. */
  def skewBalancedPredicates(
      url: String,
      schema: String,
      table: String,
      column: String,
      numPartitions: Int): Seq[String] = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    val qc = sqlIdent(column)
    val boundaries =
      (if (supportsPercentileDisc(url)) percentileBoundaries _
       else seekBoundaries _)(url, schema, table, column, numPartitions)
    if (boundaries.isEmpty) Seq("1=1")
    else {
      val first = s"$qc < ${boundaries.head} OR $qc IS NULL"
      val mids = boundaries.sliding(2).collect {
        case Seq(lo, hi) => s"$qc >= $lo AND $qc < $hi"
      }.toSeq
      val last = s"$qc >= ${boundaries.last}"
      (first +: mids) :+ last
    }
  }

  /** Dialects whose SQL has the `percentile_disc(...) WITHIN GROUP`
    * ordered-set AGGREGATE (the one-round-trip quantile probe). SQL Server
    * is deliberately absent: T-SQL's PERCENTILE_DISC is analytic-only
    * (requires an OVER clause), so the aggregate-form probe SQL is a
    * syntax error there — it takes the portable OFFSET-seek path. */
  private[sources] def supportsPercentileDisc(url: String): Boolean =
    Seq("jdbc:postgresql:", "jdbc:oracle:").exists(url.startsWith)

  /** The one-shot probe SQL: `numPartitions - 1` `percentile_disc`
    * ordered-set aggregates in a single SELECT — one server-side
    * aggregation scan returns every cut point at once. Pure function,
    * unit-tested; execution is gated on [[supportsPercentileDisc]]. */
  private[sources] def percentileProbeSql(
      schema: String,
      table: String,
      column: String,
      numPartitions: Int): String = {
    val qt = s"${sqlIdent(schema)}.${sqlIdent(table)}"
    val qc = sqlIdent(column)
    val cols = (1 until numPartitions).map { i =>
      val f = i.toDouble / numPartitions
      s"percentile_disc($f) WITHIN GROUP (ORDER BY $qc)"
    }
    s"SELECT ${cols.mkString(", ")} FROM $qt WHERE $qc IS NOT NULL"
  }

  private def percentileBoundaries(
      url: String,
      schema: String,
      table: String,
      column: String,
      numPartitions: Int): Seq[Long] = {
    if (numPartitions < 2) return Nil
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          percentileProbeSql(schema, table, column, numPartitions))
        if (!rs.next()) Nil
        else (1 until numPartitions).flatMap { i =>
          val v = rs.getLong(i)
          if (rs.wasNull()) None else Some(v)
        }.distinct.sorted
      } finally st.close()
    } finally conn.close()
  }

  /** SQL:2008-portable fallback: COUNT + k−1 single-row OFFSET seeks. */
  private def seekBoundaries(
      url: String,
      schema: String,
      table: String,
      column: String,
      numPartitions: Int): Seq[Long] = {
    val qt = s"${sqlIdent(schema)}.${sqlIdent(table)}"
    val qc = sqlIdent(column)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val n =
        try {
          val rs = st.executeQuery(s"SELECT COUNT(*) FROM $qt")
          rs.next(); rs.getLong(1)
        } finally st.close()
      (1 until numPartitions)
        .map(i => i * n / numPartitions)
        .filter(off => off > 0 && off < n)
        .distinct
        .flatMap { off =>
          val st2 = conn.createStatement()
          try {
            val rs = st2.executeQuery(
              s"SELECT $qc FROM $qt WHERE $qc IS NOT NULL ORDER BY $qc " +
                s"OFFSET $off ROWS FETCH NEXT 1 ROWS ONLY")
            if (rs.next()) Some(rs.getLong(1)) else None
          } finally st2.close()
        }
        .distinct
        .sorted
    } finally conn.close()
  }

  /** Partitioned read cut at the column's row-count quantiles instead of
    * equal id-range widths — the skew-resistant form of the
    * `partitionColumn` stride. */
  def readTableSkewBalanced(
      spark: SparkSession,
      url: String,
      plan: TablePlan,
      schema: String,
      table: String,
      sourceSchema: StructType,
      column: String,
      numPartitions: Int = 32,
      properties: java.util.Properties = new java.util.Properties()
  ): DataFrame =
    readTablePredicates(spark, url, plan, schema, table, sourceSchema,
      skewBalancedPredicates(url, schema, table, column, numPartitions),
      properties)

  /** Read the result of an arbitrary SQL query (reference wrds_sql_to_pq,
    * core.py:529): the query runs inside the database. */
  def readSql(
      spark: SparkSession,
      url: String,
      sql: String,
      properties: java.util.Properties = new java.util.Properties()
  ): DataFrame = {
    val reader = spark.read
      .format("jdbc")
      .option("url", url)
      .option("query", sql)
    properties.asInstanceOf[java.util.Hashtable[AnyRef, AnyRef]]
      .forEach((k, v) => reader.option(k.toString, v.toString))
    reader.load()
  }

  /** Estimated bytes per row from the source schema (Catalyst per-type
    * `defaultSize`; strings/binary use their conservative defaults). */
  def estimatedRowBytes(schema: StructType): Long =
    math.max(schema.fields.map(_.dataType.defaultSize.toLong).sum, 1L)

  /** Row-width-adaptive JDBC fetch size (reference duckdb_pg.py / adbc.py
    * scale batch rows by estimated row width): target a fixed byte budget
    * per network round trip so narrow tables fetch many rows while very
    * wide rows cannot blow up per-task memory. */
  def adaptiveFetchSize(
      schema: StructType,
      targetBytes: Long = 4L << 20,
      minRows: Int = 100,
      maxRows: Int = 100000
  ): Int =
    math.min(math.max(targetBytes / estimatedRowBytes(schema), minRows.toLong),
      maxRows.toLong).toInt

  /** Table comment from the database itself (reference get_table_comment,
    * postgres/comments.py:21 — the incremental-sync gate reads the comment
    * from the DB, core.py:1028). Engine-agnostic default: JDBC catalog
    * `REMARKS`; `commentSql` overrides with a dialect-specific query
    * returning one string column (see [[postgresCommentSql]]) for engines
    * whose driver does not surface comments in REMARKS. */
  def tableComment(
      url: String,
      schema: String,
      table: String,
      commentSql: Option[String] = None
  ): Option[String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      commentSql match {
        case Some(sql) =>
          val st = conn.createStatement()
          try {
            val rs = st.executeQuery(sql)
            if (rs.next()) Option(rs.getString(1)).filter(_.nonEmpty) else None
          } finally st.close()
        case None =>
          val rs = conn.getMetaData.getTables(null,
            escapeMetaPattern(conn, schema), escapeMetaPattern(conn, table),
            Array("TABLE"))
          var rem: Option[String] = None
          while (rem.isEmpty && rs.next())
            if (rs.getString("TABLE_NAME") == table &&
                schemaMatches(rs, schema))
              rem = Option(rs.getString("REMARKS")).filter(_.nonEmpty)
          rem
      }
    } finally conn.close()
  }

  /** Exact post-filter for getTables/getColumns rows (the metadata
    * pattern args are server-side narrowing; this is the guarantee).
    * Catalog-style engines (MySQL) report a NULL TABLE_SCHEM and put the
    * namespace in TABLE_CAT — match on that instead; when the driver
    * reports neither, accept the row (it has no namespace concept for
    * the exact filter to check, and the pattern already narrowed). */
  private def schemaMatches(rs: java.sql.ResultSet, schema: String): Boolean = {
    val sch = rs.getString("TABLE_SCHEM")
    if (sch != null) sch == schema
    else {
      val cat =
        try rs.getString("TABLE_CAT")
        catch { case _: java.sql.SQLException => null }
      cat == null || cat == schema
    }
  }

  /** SQL single-quoted string literal with embedded quotes doubled. */
  private[graft] def sqlLiteral(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** Escape JDBC metadata wildcards in an EXACT name: getTables/getColumns
    * treat their schema/table arguments as search patterns where `_`
    * matches any character — unescaped, `my_table` matches `myXtable` too,
    * and a columns lookup would interleave both tables' columns. Some
    * drivers (Derby) report NO escape character, so every call site ALSO
    * post-filters rows on exact TABLE_SCHEM/TABLE_NAME equality — the
    * escape is server-side narrowing, the filter is the guarantee. */
  private def escapeMetaPattern(conn: java.sql.Connection, name: String): String = {
    val esc = conn.getMetaData.getSearchStringEscape
    if (esc == null || esc.isEmpty) name
    else name.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
  }

  /** SQL double-quoted identifier with embedded quotes doubled. */
  private[graft] def sqlIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** The PostgreSQL comment lookup the reference issues (pg_description
    * via obj_description; comments.py:21) for use as `commentSql`.
    * Schema/table are embedded as escaped literals — a name containing
    * quotes cannot break out of the statement. */
  def postgresCommentSql(schema: String, table: String): String =
    s"""SELECT d.description
        FROM pg_catalog.pg_class c
        JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
        JOIN pg_catalog.pg_description d ON d.objoid = c.oid AND d.objsubid = 0
        WHERE n.nspname = ${sqlLiteral(schema)} AND c.relname = ${sqlLiteral(table)}"""

  /** Write a table comment into the database (reference set_table_comment,
    * comments.py:35; the reverse-mirror path stamps the comment on the
    * destination after `pq_to_pg` so future update gates compare against
    * it, update.py:220). `writeSql` defaults to the PostgreSQL
    * `COMMENT ON TABLE` statement; engines without comment DDL pass a
    * dialect statement instead (e.g. an upsert into a comments table). */
  def setTableComment(
      url: String,
      schema: String,
      table: String,
      comment: Option[String],
      writeSql: Option[String] = None
  ): Unit = {
    val sql = writeSql.getOrElse(
      postgresSetCommentSql(schema, table, comment))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }

  /** PostgreSQL `COMMENT ON TABLE` DDL (NULL clears, as the reference's
    * set_table_comment does; identifiers and the comment literal are both
    * quote-escaped). */
  def postgresSetCommentSql(schema: String, table: String, comment: Option[String]): String = {
    val value = comment match {
      case Some(c) => sqlLiteral(c)
      case None    => "NULL"
    }
    s"COMMENT ON TABLE ${sqlIdent(schema)}.${sqlIdent(table)} IS $value"
  }

  /** Full column metadata incl. numeric precision/scale (reference
    * postgres/introspect.py:28 precision-bound introspection used for
    * decimal repair): (name, typeName, precision, scale, nullable) in
    * ordinal order. Precision/scale are None where the driver reports
    * none (non-numeric types). */
  final case class ColumnMeta(
      name: String,
      typeName: String,
      precision: Option[Int],
      scale: Option[Int],
      nullable: Boolean)

  def tableColumnsMeta(url: String, schema: String, table: String): Seq[ColumnMeta] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null,
        escapeMetaPattern(conn, schema), escapeMetaPattern(conn, table), "%")
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, ColumnMeta)]
      while (rs.next()) if (rs.getString("TABLE_NAME") == table &&
          schemaMatches(rs, schema)) {
        val size = rs.getInt("COLUMN_SIZE")
        val sizeOpt = if (rs.wasNull()) None else Some(size)
        val dd = rs.getInt("DECIMAL_DIGITS")
        val ddOpt = if (rs.wasNull()) None else Some(dd)
        out += ((rs.getInt("ORDINAL_POSITION"), ColumnMeta(
          rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME"),
          sizeOpt, ddOpt,
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)))
      }
      out.sortBy(_._1).map(_._2).toSeq
    } finally conn.close()
  }

  /** List table names in a database schema (reference db_schema_tables,
    * postgres/schema.py:35) via JDBC catalog metadata — engine-agnostic.
    *
    * Namespace-less engines (driver reports neither TABLE_SCHEM nor
    * TABLE_CAT): the `schema` argument cannot be checked and every table
    * matches — the listing is the whole database regardless of the name
    * passed (see [[schemaMatches]]). On namespaced engines a wrong
    * `schema` returns empty, as expected. */
  def schemaTables(url: String, schema: String): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null,
        escapeMetaPattern(conn, schema), "%", Array("TABLE"))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next())
        if (schemaMatches(rs, schema))
          out += rs.getString("TABLE_NAME")
      out.toSeq.sorted
    } finally conn.close()
  }

  /** Table existence (reference table_exists, postgres/introspect.py:1).
    *
    * Namespace-less engines (neither TABLE_SCHEM nor TABLE_CAT in the
    * driver's metadata): `schema` cannot be checked, so existence is
    * decided by the table name alone — a typo'd schema still finds the
    * table (see [[schemaMatches]]); namespaced engines match exactly. */
  def tableExists(url: String, schema: String, table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null,
        escapeMetaPattern(conn, schema), escapeMetaPattern(conn, table),
        Array("TABLE"))
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME") == table &&
          schemaMatches(rs, schema)
      found
    } finally conn.close()
  }

  /** Column name → database type name, in ordinal order (reference
    * get_table_columns + get_table_column_types, introspect.py:7-28).
    * Namespace-less engines: same caveat as [[tableExists]] — `schema`
    * is unchecked there, the table name alone selects the metadata. */
  def tableColumns(url: String, schema: String, table: String): Seq[(String, String)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null,
        escapeMetaPattern(conn, schema), escapeMetaPattern(conn, table), "%")
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
      while (rs.next()) if (rs.getString("TABLE_NAME") == table &&
          schemaMatches(rs, schema))
        out += ((rs.getInt("ORDINAL_POSITION"),
          rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME")))
      out.sortBy(_._1).map(t => (t._2, t._3)).toSeq
    } finally conn.close()
  }

  /** Column DDL for Spark's `createTableColumnTypes` writer option. Spark
    * parses this option with its OWN DDL parser (`parseTableSchema`) and
    * lets the JDBC dialect map each Spark type to the database's DDL name
    * at CREATE TABLE (string → TEXT on PostgreSQL, binary → BYTEA, …) —
    * emitting PostgreSQL names here ("text", "bytea", "double precision")
    * fails at parse time before a single row is written. User-supplied
    * PG-ish/Arrow-ish names normalize to Spark DDL via [[Types.normalize]];
    * the direct-to-PG DDL mapping lives in the COPY path
    * (`PgCopy.createTableSql`), which really does speak PostgreSQL. */
  def createTableColumnTypes(colTypes: Map[String, String]): String =
    colTypes
      .map { case (c, t) => s"$c ${Types.normalize(t)}" }
      .mkString(", ")

  /** Write a DataFrame to a database table (reference pq_to_pg). */
  def writeTable(
      df: DataFrame,
      url: String,
      schema: String,
      table: String,
      colTypes: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    val writer = df.write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", s"$schema.$table")
    val withTypes =
      if (colTypes.isEmpty) writer
      else writer.option("createTableColumnTypes", createTableColumnTypes(colTypes))
    withTypes.save()
  }
}
