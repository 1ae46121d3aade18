package graft.plans

/** User-facing type-alias normalization.
  *
  * Mirrors the alias table of the reference engine (db2pq/types.py:4-40,
  * normalize_col_types at types.py:70): users may write PostgreSQL-ish,
  * Arrow-ish, or Spark-ish type names and get a canonical Spark DDL type.
  * Unknown names pass through unchanged so `CAST` parity with the reference
  * is preserved ("one can't fix arbitrary type issues" — but one can try).
  */
object Types {

  private val aliases: Map[String, String] = Map(
    "bool" -> "boolean",
    "boolean" -> "boolean",
    "int2" -> "smallint",
    "smallint" -> "smallint",
    "int16" -> "smallint",
    "int4" -> "int",
    "int" -> "int",
    "integer" -> "int",
    "int32" -> "int",
    "int8" -> "bigint",
    "bigint" -> "bigint",
    "int64" -> "bigint",
    "float4" -> "float",
    "real" -> "float",
    "float32" -> "float",
    "float8" -> "double",
    "double" -> "double",
    "double precision" -> "double",
    "float64" -> "double",
    "text" -> "string",
    "string" -> "string",
    "large_string" -> "string",
    "varchar" -> "string",
    "character varying" -> "string",
    "char" -> "string",
    "character" -> "string",
    "utf8" -> "string",
    "date" -> "date",
    "date32" -> "date",
    "timestamp" -> "timestamp",
    "datetime" -> "timestamp",
    "timestamp without time zone" -> "timestamp",
    "bytea" -> "binary",
    "bytes" -> "binary",
    "binary" -> "binary"
  )

  /** Map for emitting PostgreSQL DDL on the JDBC write path
    * (reference: _ENGINE_TYPE_MAPS["postgres"], db2pq/types.py:55-66). */
  private val sparkToPg: Map[String, String] = Map(
    "boolean" -> "boolean",
    "smallint" -> "smallint",
    "int" -> "integer",
    "bigint" -> "bigint",
    "float" -> "real",
    "double" -> "double precision",
    "string" -> "text",
    "date" -> "date",
    "timestamp" -> "timestamp",
    "binary" -> "bytea"
  )

  /** Normalize a user-supplied type name to a Spark DDL type. */
  def normalize(typeName: String): String =
    aliases.getOrElse(typeName.trim.toLowerCase, typeName)

  /** Normalize every value of a col_types map. */
  def normalizeColTypes(colTypes: Map[String, String]): Map[String, String] =
    colTypes.map { case (c, t) => c -> normalize(t) }

  /** Spark DDL type → PostgreSQL DDL type (JDBC write path). */
  def toPostgres(sparkType: String): String =
    sparkToPg.getOrElse(normalize(sparkType), sparkType)

  def isBoolean(typeName: String): Boolean =
    normalize(typeName) == "boolean"
}
