package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.plans.TablePlan

/** Whole-schema export: apply a plan to every table of a source and land
  * the results in a [[PqRepo]] (reference db_schema_to_pq, core.py:765, and
  * wrds_update_schema, core.py:1217).
  *
  * Sources are addressed generically: a directory of parquet tables (the
  * test harness), or any `tableNames → DataFrame` loader (a JDBC catalog at
  * ingest time). Each table goes through the same TablePlan machinery, so
  * schema-wide exports inherit pushdown, casting, and tz rules.
  */
object SchemaExport {

  /** Export `tables` from a parquet directory into `repo/<schema>/`.
    * Returns (table, written path) pairs; skips via repo.updateWrite when
    * `sourceComment` is provided and the destination is current. */
  def fromParquetDir(
      spark: SparkSession,
      srcDir: String,
      tables: Seq[String],
      repo: PqRepo,
      schema: String,
      plan: TablePlan = TablePlan(),
      modified: Option[String] = None,
      archiveExisting: Boolean = false
  ): Seq[(String, Path)] =
    tables.map { table =>
      val df = plan(spark.read.parquet(s"$srcDir/$table.parquet"))
      table -> repo.write(df, schema, table, modified = modified,
        archiveExisting = archiveExisting)
    }

  /** Incremental variant: only tables whose `sourceComment` is newer than
    * the stored copy are rewritten (reference wrds_update_schema). */
  def updateFromParquetDir(
      spark: SparkSession,
      srcDir: String,
      tables: Seq[String],
      repo: PqRepo,
      schema: String,
      sourceComment: String => Option[String],
      plan: TablePlan = TablePlan(),
      force: Boolean = false
  ): Seq[(String, Option[Path])] =
    tables.map { table =>
      table -> repo.updateWrite(
        plan(spark.read.parquet(s"$srcDir/$table.parquet")),
        schema, table, sourceComment(table), force = force)
    }
}
