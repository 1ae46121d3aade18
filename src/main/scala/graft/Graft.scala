package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.plans.TablePlan
import graft.sources.{Jdbc, PgCopy, PgRoles, PqRepo}
import graft.sync.Modified

/** Top-level façade: the reference's workflow entry points re-expressed
  * over graft's parts (reference db2pq/__init__.py public API). A db2pq
  * user maps calls 1:1:
  *
  *  - `db_to_pq(table, schema, keep/drop/rename/col_types/where/obs/tz,
  *    numeric_mode, archive)`            → [[dbToPq]]
  *  - `pg_update_pq(...)` / `wrds_update_pq(...)` → [[dbUpdatePq]]
  *  - `db_schema_to_pq(schema)`          → [[sources.SchemaExport]]
  *  - `wrds_sql_to_pq(sql, ...)`         → [[sqlToPq]]
  *  - `pq_to_pg(...)`                    → [[pqToDb]]
  *  - `pq_update_pg(...)`                → [[pqUpdateDb]]
  *  - `pq_list_files/pq_archive/pq_restore/pq_remove/pq_last_modified`
  *                                       → [[sources.PqRepo]] methods
  *
  * The ingest side is plain `spark.read.jdbc` under the hood — on a
  * cluster the partitioned read fans the SELECT out across executors,
  * which is the scale story the single-connection reference lacks.
  */
object Graft {

  /** Export a database table to the parquet repository (db_to_pq,
    * core.py:43): plan pushed into the database, partitioned read,
    * metadata-stamped atomic repo write. */
  def dbToPq(
      spark: SparkSession,
      url: String,
      schema: String,
      table: String,
      sourceSchema: StructType,
      repo: PqRepo,
      plan: TablePlan = TablePlan(),
      altTableName: Option[String] = None,
      modified: Option[String] = None,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 32,
      archive: Boolean = false,
      skewBalanced: Boolean = false
  ): Path = {
    // skewBalanced cuts the partition column at database-probed row-count
    // quantiles instead of equal id-range widths, so a hotspotted or
    // mostly-deleted id range cannot produce one straggler fetch task
    val df =
      if (skewBalanced && partitionColumn.isDefined)
        Jdbc.readTableSkewBalanced(spark, url, plan, schema, table,
          sourceSchema, partitionColumn.get, numPartitions)
      else
        Jdbc.readTable(spark, url, plan, schema, table, sourceSchema,
          partitionColumn, lowerBound, upperBound, numPartitions)
    repo.write(df, schema, altTableName.getOrElse(table),
      modified = modified, archiveExisting = archive)
  }

  /** Update-gated export (pg_update_pq / wrds_update_pq, core.py:955/1028):
    * runs [[dbToPq]] only when `sourceComment` is newer than the stored
    * table's metadata. `source` is lazy — nothing is read when current. */
  def dbUpdatePq(
      repo: PqRepo,
      schema: String,
      table: String,
      sourceComment: Option[String],
      source: => DataFrame,
      force: Boolean = false,
      archive: Boolean = false
  ): Option[Path] =
    repo.updateWrite(source, schema, table, sourceComment,
      force = force, archiveExisting = archive)

  /** Fully self-contained update gate (wrds_update_pq, core.py:1028): the
    * source comment is read FROM THE DATABASE ITSELF (JDBC REMARKS, or a
    * dialect query like [[Jdbc.postgresCommentSql]]), compared against the
    * repo table's embedded metadata, and the export runs only when newer.
    * Nothing is read from the source when the repo copy is current. */
  def dbUpdatePqFromDb(
      spark: SparkSession,
      url: String,
      schema: String,
      table: String,
      sourceSchema: StructType,
      repo: PqRepo,
      plan: TablePlan = TablePlan(),
      commentSql: Option[String] = None,
      force: Boolean = false,
      archive: Boolean = false,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 32
  ): Option[Path] = {
    val comment = Jdbc.tableComment(url, schema, table, commentSql)
    dbUpdatePq(repo, schema, table, comment,
      Jdbc.readTable(spark, url, plan, schema, table, sourceSchema,
        partitionColumn, lowerBound, upperBound, numPartitions),
      force = force, archive = archive)
  }

  /** Mirror a table between databases (db_to_pg / wrds_pg_to_pg,
    * core.py:269/663).
    *
    * PG→PG (both URLs `jdbc:postgresql:`, no colTypes overrides) takes the
    * reference's binary-COPY fast path (postgres/copy.py:18-24): the
    * planned SELECT streams `COPY ... TO STDOUT (FORMAT BINARY)` straight
    * into `COPY ... FROM STDIN (FORMAT BINARY)` on the destination —
    * no Spark row materialization, no type re-encoding, an order of
    * magnitude faster on wide tables. The destination table is created
    * from the plan's output schema first (the reference's schema-only
    * CTAS, duckdb_ddl.py:3). Every other dialect pairing — or
    * `binaryCopy = false` — falls back to the planned partitioned JDBC
    * read + typed JDBC write.
    *
    * `createRoles` mirrors the reference's public default
    * (update.py:92-127, `create_roles=True`): on a PostgreSQL destination
    * the schema is created when absent, a schema-named owner role and a
    * `<schema>_access` read role are ensured with USAGE, and the loaded
    * table gets OWNER + GRANT SELECT. Role DDL is PG-dialect-only, so
    * non-PG destinations skip it (like the COPY pumps). */
  def dbToDb(
      spark: SparkSession,
      srcUrl: String,
      dstUrl: String,
      schema: String,
      table: String,
      sourceSchema: StructType,
      plan: TablePlan = TablePlan(),
      dstSchema: Option[String] = None,
      dstTable: Option[String] = None,
      colTypes: Map[String, String] = Map.empty,
      binaryCopy: Boolean = true,
      createRoles: Boolean = true
  ): Unit = {
    val ds = dstSchema.getOrElse(schema)
    val dt = dstTable.getOrElse(table)
    val pgDst = PgCopy.isPostgres(dstUrl)
    if (pgDst) PgRoles.ensureSchemaAndRoles(dstUrl, ds, createRoles)
    if (binaryCopy && colTypes.isEmpty &&
        PgCopy.isPostgres(srcUrl) && pgDst) {
      // plan output schema (names + types) without touching the source:
      // apply the plan to an empty frame carrying the source schema
      val out = plan(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        sourceSchema)).schema
      PgCopy.copyTable(srcUrl, dstUrl,
        plan.toSelectSql(schema, table, sourceSchema), ds, dt,
        out.fields.map(_.name).toIndexedSeq,
        ddl = Seq(PgCopy.dropTableSql(ds, dt), PgCopy.createTableSql(ds, dt, out)))
    } else
      Jdbc.writeTable(
        Jdbc.readTable(spark, srcUrl, plan, schema, table, sourceSchema),
        dstUrl, ds, dt, colTypes)
    if (pgDst && createRoles) PgRoles.applyTableRoles(dstUrl, ds, dt)
  }

  /** Export every table of a database schema to the repo
    * (db_schema_to_pq, core.py:765) — discovery via JDBC catalog metadata,
    * each table through [[dbToPq]]. */
  def dbSchemaToPq(
      spark: SparkSession,
      url: String,
      schema: String,
      repo: PqRepo,
      plan: TablePlan = TablePlan()
  ): Seq[(String, Path)] =
    Jdbc.schemaTables(url, schema).map { table =>
      // quoted identifiers: the catalog can legitimately return
      // mixed-case or special-character names, which an unquoted
      // dbtable would case-fold or fail to parse
      val srcSchema = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", s"${Jdbc.sqlIdent(schema)}.${Jdbc.sqlIdent(table)}")
        .load().schema
      table -> dbToPq(spark, url, schema, table, srcSchema, repo, plan)
    }

  /** Run arbitrary SQL in the database, land the result in the repo
    * (wrds_sql_to_pq, core.py:529). */
  def sqlToPq(
      spark: SparkSession,
      url: String,
      sql: String,
      repo: PqRepo,
      schema: String,
      table: String,
      modified: Option[String] = None,
      archive: Boolean = false
  ): Path =
    repo.write(Jdbc.readSql(spark, url, sql), schema, table,
      modified = modified, archiveExisting = archive)

  /** Any-backend ingest (reference ibis_to_pq, db2pq/ibis.py:17): the
    * reference reaches non-PostgreSQL engines through ibis backends; Spark
    * reaches them through its DataSource registry, so the graft analog is
    * a thin façade over `spark.read.format(...)` — csv, json, orc,
    * parquet, avro, jdbc, or any third-party V2 connector name on the
    * classpath — through the same TablePlan machinery (keep/drop/rename/
    * cast/where pushed into the scan where the source supports pushdown)
    * into the same metadata-stamped atomic repo write. */
  def anyFormatToPq(
      spark: SparkSession,
      format: String,
      options: Map[String, String],
      repo: PqRepo,
      schema: String,
      table: String,
      path: Option[String] = None,
      sourceSchema: Option[StructType] = None,
      plan: TablePlan = TablePlan(),
      modified: Option[String] = None,
      archive: Boolean = false
  ): Path = {
    val reader = spark.read.format(format).options(options)
    sourceSchema.foreach(reader.schema)
    val df = path.map(reader.load).getOrElse(reader.load())
    repo.write(plan(df), schema, table,
      modified = modified, archiveExisting = archive)
  }

  /** Load a repo table into a database (pq_to_pg, postgres/update.py:480).
    * `dstSchema`/`dstTable` default to the repo names (reference
    * `dst_schema` / `alt_table_name`). With `stampComment` the repo's
    * embedded `last_modified` is written as the destination's table
    * comment after the load (reference update.py:220) so a future
    * [[pqUpdateDb]]/[[dbUpdatePqFromDb]] gate compares against it;
    * `commentWriteSql` overrides the PostgreSQL `COMMENT ON` DDL for
    * engines without it.
    *
    * Against PostgreSQL (`copyIngest = true`, the default) an Overwrite
    * or Append load takes the COPY csv fast path: destination DDL from
    * the repo schema, then every partition streams
    * `COPY ... FROM STDIN (FORMAT csv)` over its own connection — the
    * parallel, no-typed-INSERT ingest shape. ErrorIfExists/Ignore carry
    * existence semantics COPY has no protocol for, so they always go
    * through the JDBC writer (as do other dialects). Timestamps serialize
    * through JDBC `toString`; keep the JVM and the PG server on UTC
    * (graft sessions default to UTC) for lossless round-trips.
    *
    * `createRoles` as in [[dbToDb]]: the reference's schema-owner +
    * `<schema>_access` role management (update.py:92-127), applied on
    * PostgreSQL destinations only. */
  def pqToDb(
      repo: PqRepo,
      url: String,
      schema: String,
      table: String,
      dstSchema: Option[String] = None,
      dstTable: Option[String] = None,
      colTypes: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.Overwrite,
      stampComment: Boolean = false,
      commentWriteSql: Option[String] => Option[String] = _ => None,
      copyIngest: Boolean = true,
      createRoles: Boolean = true
  ): Unit = {
    val ds = dstSchema.getOrElse(schema)
    val dt = dstTable.getOrElse(table)
    val df = repo.table(schema, table)
    val pgDst = PgCopy.isPostgres(url)
    if (pgDst) PgRoles.ensureSchemaAndRoles(url, ds, createRoles)
    val copyMode = mode == SaveMode.Overwrite || mode == SaveMode.Append
    if (copyIngest && copyMode && pgDst) {
      val pgTypes = colTypes.map { case (c, t) =>
        c -> graft.plans.Types.toPostgres(t)
      }
      val ddl =
        if (mode == SaveMode.Overwrite)
          Seq(PgCopy.dropTableSql(ds, dt),
            PgCopy.createTableSql(ds, dt, df.schema, pgTypes))
        else
          Seq(PgCopy.createTableSql(ds, dt, df.schema, pgTypes, ifNotExists = true))
      PgCopy.execDdl(url, ddl)
      PgCopy.copyFromDataFrame(df, url, ds, dt)
    } else
      Jdbc.writeTable(df, url, ds, dt, colTypes, mode)
    if (pgDst && createRoles) PgRoles.applyTableRoles(url, ds, dt)
    if (stampComment) {
      val comment = repo.lastModified(schema, table)
      Jdbc.setTableComment(url, ds, dt, comment, commentWriteSql(comment))
    }
  }

  /** Update-gated reverse path (pq_update_pg, postgres/update.py:570):
    * write to the database only when the repo copy is newer than the
    * destination's comment. */
  def pqUpdateDb(
      repo: PqRepo,
      url: String,
      schema: String,
      table: String,
      destComment: Option[String],
      colTypes: Map[String, String] = Map.empty,
      force: Boolean = false,
      write: DataFrame => Unit = null
  ): Boolean = {
    val src = Modified.info("pq", repo.lastModified(schema, table))
    val dst = Modified.info("pg", destComment)
    val proceed = force || (src.date.isDefined && Modified.updateAvailable(src, dst))
    if (proceed) {
      val df = repo.table(schema, table)
      if (write != null) write(df)
      else Jdbc.writeTable(df, url, schema, table, colTypes)
    }
    proceed
  }
}
