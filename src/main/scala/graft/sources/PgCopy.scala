package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** PostgreSQL COPY fast paths (reference postgres/copy.py:18-24 binary
  * PG→PG streaming; duckdb_ddl.py:3 schema-only CTAS for the destination
  * DDL).
  *
  * Two paths, both dialect-gated on `jdbc:postgresql:` URLs with a JDBC
  * fallback elsewhere:
  *
  *  - [[binaryCopy]]: server→client→server streaming of the PG binary wire
  *    format (`COPY ... TO STDOUT (FORMAT BINARY)` piped into
  *    `COPY ... FROM STDIN (FORMAT BINARY)`) — the reference's PG→PG
  *    mirror. No row materialization, no type re-encoding; an order of
  *    magnitude faster than typed INSERTs on wide tables.
  *  - [[copyFromDataFrame]]: distributed CSV COPY ingest for the
  *    parquet→PG reverse path — each executor partition opens its own
  *    connection and streams `COPY ... FROM STDIN (FORMAT csv)`, so a
  *    1000-executor load fans into the database in parallel (bounded by
  *    the DataFrame's partition count; `df.coalesce` to throttle).
  *
  * The PostgreSQL driver is reached via reflection: the library compiles
  * and the gate/SQL generation stay unit-testable without the driver jar;
  * at runtime the driver must be on the classpath — the same requirement
  * any PG JDBC path has. Derby cannot execute PG COPY, so the pumps are
  * exercised against PostgreSQL deployments only; SQL generation, CSV
  * encoding, DDL synthesis, and the dialect gate are spec-covered.
  */
object PgCopy {

  /** Dialect gate: only PostgreSQL speaks the COPY protocol. */
  def isPostgres(url: String): Boolean = url.startsWith("jdbc:postgresql:")

  /** `COPY (select) TO STDOUT (FORMAT BINARY)` — source side of the
    * reference's PG→PG stream (copy.py:19). */
  def copyOutSql(selectSql: String): String =
    s"COPY ($selectSql) TO STDOUT (FORMAT BINARY)"

  /** `COPY schema.table (cols) FROM STDIN (FORMAT BINARY)` with quoted
    * identifiers (copy.py:22 uses an explicit quoted column list). */
  def copyInSql(schema: String, table: String, cols: Seq[String]): String =
    s"COPY ${Jdbc.sqlIdent(schema)}.${Jdbc.sqlIdent(table)} " +
      s"(${cols.map(Jdbc.sqlIdent).mkString(", ")}) FROM STDIN (FORMAT BINARY)"

  /** CSV-dialect COPY target for the distributed DataFrame ingest. */
  def copyInCsvSql(schema: String, table: String, cols: Seq[String]): String =
    s"COPY ${Jdbc.sqlIdent(schema)}.${Jdbc.sqlIdent(table)} " +
      s"(${cols.map(Jdbc.sqlIdent).mkString(", ")}) FROM STDIN (FORMAT csv)"

  /** PostgreSQL column type for a Spark field — the destination DDL the
    * reference gets from its schema-only CTAS (duckdb_ddl.py:30). */
  def pgColumnType(dt: DataType): String = dt match {
    case BooleanType               => "boolean"
    case ByteType | ShortType      => "smallint"
    case IntegerType               => "integer"
    case LongType                  => "bigint"
    case FloatType                 => "real"
    case DoubleType                => "double precision"
    case StringType                => "text"
    case DateType                  => "date"
    case TimestampType             => "timestamptz"
    case TimestampNTZType          => "timestamp"
    case BinaryType                => "bytea"
    case d: DecimalType            => s"numeric(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no PostgreSQL mapping for ${other.simpleString}")
  }

  /** Destination `CREATE TABLE` DDL from an output schema;
    * `colTypes` (output column → PG type) overrides per column. */
  def createTableSql(
      schema: String,
      table: String,
      output: StructType,
      colTypes: Map[String, String] = Map.empty,
      ifNotExists: Boolean = false): String = {
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    val cols = output.fields.map { f =>
      val t = colTypes.getOrElse(f.name, pgColumnType(f.dataType))
      s"${Jdbc.sqlIdent(f.name)} $t"
    }
    s"CREATE TABLE $ine${Jdbc.sqlIdent(schema)}.${Jdbc.sqlIdent(table)} " +
      s"(${cols.mkString(", ")})"
  }

  def dropTableSql(schema: String, table: String): String =
    s"DROP TABLE IF EXISTS ${Jdbc.sqlIdent(schema)}.${Jdbc.sqlIdent(table)}"

  // ---- CSV encoding (PostgreSQL COPY csv dialect) --------------------------

  private val hex = "0123456789abcdef".toCharArray

  /** One field in PG COPY csv: unquoted empty = NULL; strings always
    * quoted with doubled quotes (so an empty string stays distinct from
    * NULL); binary as bytea hex (`\x...`); temporal types via their
    * ISO-ish JDBC `toString`, which PostgreSQL parses natively. */
  private[graft] def csvField(v: Any): String = v match {
    case null             => ""
    case s: String        => "\"" + s.replace("\"", "\"\"") + "\""
    case b: Array[Byte]   =>
      val sb = new StringBuilder(2 + 2 * b.length).append("\\x")
      b.foreach(x => sb.append(hex((x >> 4) & 0xF)).append(hex(x & 0xF)))
      sb.toString()
    // render the INSTANT with an explicit +00 offset: Timestamp.toString
    // formats in the executor JVM's default zone with no zone suffix, so
    // the server would re-interpret the wall clock in ITS zone — every
    // value silently shifted by the JVM/server offset. With the offset
    // spelled out, timestamptz stores the exact instant and plain
    // timestamp stores the UTC wall clock (Spark's convention for
    // instants) on any server TimeZone.
    case t: java.sql.Timestamp      =>
      "\"" + t.toInstant.toString.replace('T', ' ').replace("Z", "+00") + "\""
    case t: java.time.LocalDateTime => "\"" + t.toString.replace('T', ' ') + "\""
    case t: java.time.Instant       => "\"" + t.toString + "\""
    case d: java.sql.Date           => d.toString
    case d: java.time.LocalDate     => d.toString
    case other            => other.toString
  }

  /** One CSV record (no trailing newline). */
  private[graft] def csvRecord(row: Row): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append(',')
      sb.append(csvField(row.get(i)))
      i += 1
    }
    sb.toString()
  }

  // ---- reflective CopyManager access ---------------------------------------

  private def cls(name: String) = Class.forName(name)

  private def copyManager(conn: Connection): AnyRef = {
    val bc = cls("org.postgresql.core.BaseConnection")
    cls("org.postgresql.copy.CopyManager")
      .getConstructor(bc)
      .newInstance(conn.unwrap(bc.asInstanceOf[Class[AnyRef]]))
      .asInstanceOf[AnyRef]
  }

  private def cancelQuietly(iface: Class[_], op: AnyRef): Unit =
    try iface.getMethod("cancelCopy").invoke(op)
    catch { case _: Exception => () }

  /** Pump `COPY TO STDOUT (FORMAT BINARY)` chunks from `src` straight into
    * `COPY FROM STDIN (FORMAT BINARY)` on `dst` (reference copy.py:18-24:
    * `for chunk in out: inn.write(chunk)`). Returns rows written. */
  def binaryCopy(src: Connection, dst: Connection, outSql: String, inSql: String): Long = {
    val cmClass = cls("org.postgresql.copy.CopyManager")
    val outIface = cls("org.postgresql.copy.CopyOut")
    val inIface = cls("org.postgresql.copy.CopyIn")
    val copyOut = cmClass.getMethod("copyOut", classOf[String])
      .invoke(copyManager(src), outSql)
    val copyIn = cmClass.getMethod("copyIn", classOf[String])
      .invoke(copyManager(dst), inSql)
    val read = outIface.getMethod("readFromCopy")
    val write = inIface.getMethod("writeToCopy",
      classOf[Array[Byte]], classOf[Int], classOf[Int])
    try {
      var chunk = read.invoke(copyOut).asInstanceOf[Array[Byte]]
      while (chunk != null) {
        write.invoke(copyIn, chunk, Int.box(0), Int.box(chunk.length))
        chunk = read.invoke(copyOut).asInstanceOf[Array[Byte]]
      }
      inIface.getMethod("endCopy").invoke(copyIn)
        .asInstanceOf[java.lang.Long].longValue()
    } catch {
      case e: Throwable =>
        cancelQuietly(inIface, copyIn)
        cancelQuietly(outIface, copyOut)
        throw e
    }
  }

  /** Stream pre-encoded CSV records into a COPY csv sink on one
    * connection; buffers ~64 KiB between driver calls. Returns rows. */
  private def copyInCsv(conn: Connection, sql: String, records: Iterator[String]): Long = {
    val cmClass = cls("org.postgresql.copy.CopyManager")
    val inIface = cls("org.postgresql.copy.CopyIn")
    val copyIn = cmClass.getMethod("copyIn", classOf[String])
      .invoke(copyManager(conn), sql)
    val write = inIface.getMethod("writeToCopy",
      classOf[Array[Byte]], classOf[Int], classOf[Int])
    try {
      val buf = new StringBuilder(1 << 16)
      def flush(): Unit = if (buf.nonEmpty) {
        val bytes = buf.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        write.invoke(copyIn, bytes, Int.box(0), Int.box(bytes.length))
        buf.clear()
      }
      records.foreach { r =>
        buf.append(r).append('\n')
        if (buf.length >= (1 << 16)) flush()
      }
      flush()
      inIface.getMethod("endCopy").invoke(copyIn)
        .asInstanceOf[java.lang.Long].longValue()
    } catch {
      case e: Throwable => cancelQuietly(inIface, copyIn); throw e
    }
  }

  /** Run DDL statements on one connection (shared by the mirror pump and
    * the DataFrame ingest's destination preparation). */
  def execDdl(url: String, ddl: Seq[String]): Unit = {
    if (ddl.nonEmpty) {
      val conn = DriverManager.getConnection(url)
      try ddl.foreach { s =>
        val st = conn.createStatement()
        try st.execute(s) finally st.close()
      } finally conn.close()
    }
  }

  /** PG→PG mirror of one planned SELECT (reference
    * copy_wrds_select_to_pg_table): optional destination DDL, then the
    * binary pump. Single source connection by design — the PG COPY
    * protocol is per-session; parallel mirroring shards at the table
    * level (one table per task), which is how the reference operates. */
  def copyTable(
      srcUrl: String,
      dstUrl: String,
      selectSql: String,
      dstSchema: String,
      dstTable: String,
      cols: Seq[String],
      ddl: Seq[String] = Nil): Long = {
    execDdl(dstUrl, ddl)
    val src = DriverManager.getConnection(srcUrl)
    try {
      val dst = DriverManager.getConnection(dstUrl)
      try binaryCopy(src, dst, copyOutSql(selectSql),
        copyInSql(dstSchema, dstTable, cols))
      finally dst.close()
    } finally src.close()
  }

  /** Distributed CSV COPY ingest: every DataFrame partition streams its
    * rows over its own connection. The scale path for parquet→PG loads —
    * JDBC typed INSERTs round-trip each value through setObject; COPY csv
    * moves one text stream per partition. Returns total rows written
    * (exactly once per task attempt; PG aborts a failed COPY atomically,
    * but task RETRIES can double-load — run against a staging table or an
    * idempotent target when speculative execution is on). */
  def copyFromDataFrame(
      df: DataFrame,
      url: String,
      schema: String,
      table: String): Long = {
    val sql = copyInCsvSql(schema, table, df.columns.toIndexedSeq)
    val acc = df.sparkSession.sparkContext.longAccumulator("pg_copy_rows")
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try acc.add(copyInCsv(conn, sql, rows.map(csvRecord)))
        finally conn.close()
      }
    }
    acc.value
  }
}
