package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TablePlan

/** COPY fast-path unit coverage: SQL generation, DDL synthesis, CSV
  * encoding, dialect gate. (Derby cannot execute PG COPY, so the binary
  * pump itself runs only against real PostgreSQL; the JDBC fallback is
  * integration-tested in JdbcIntegrationSpec's dbToDb/pqToDb tests, which
  * run with the gate at its default `true` against Derby URLs.) */
class PgCopySpec extends AnyFunSuite {

  test("dialect gate accepts only postgresql JDBC URLs") {
    assert(PgCopy.isPostgres("jdbc:postgresql://host:5432/db"))
    assert(PgCopy.isPostgres("jdbc:postgresql:wrds"))
    assert(!PgCopy.isPostgres("jdbc:derby:memory:graftdb;create=true"))
    assert(!PgCopy.isPostgres("jdbc:mysql://host/db"))
  }

  test("COPY OUT wraps the planned SELECT; COPY IN quotes identifiers") {
    val select = TablePlan(keep = Seq("^(a|b)$"), where = Some("a > 1"))
      .toSelectSql("s", "t", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType),
        StructField("c", IntegerType))))
    assert(PgCopy.copyOutSql(select) ==
      s"COPY ($select) TO STDOUT (FORMAT BINARY)")
    assert(PgCopy.copyInSql("sch", "tbl", Seq("a", "b")) ==
      """COPY "sch"."tbl" ("a", "b") FROM STDIN (FORMAT BINARY)""")
    // identifiers with embedded quotes cannot break out
    assert(PgCopy.copyInSql("s\"x", "t", Seq("c\"1")) ==
      "COPY \"s\"\"x\".\"t\" (\"c\"\"1\") FROM STDIN (FORMAT BINARY)")
    assert(PgCopy.copyInCsvSql("s", "t", Seq("a")) ==
      """COPY "s"."t" ("a") FROM STDIN (FORMAT csv)""")
  }

  test("destination DDL from a Spark schema, with overrides and modes") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("price", DecimalType(12, 2)),
      StructField("ts", TimestampNTZType),
      StructField("blob", BinaryType)))
    assert(PgCopy.createTableSql("s", "t", schema) ==
      """CREATE TABLE "s"."t" ("id" bigint, "name" text, """ +
        """"price" numeric(12,2), "ts" timestamp, "blob" bytea)""")
    assert(PgCopy.createTableSql("s", "t",
      StructType(Seq(StructField("id", LongType))),
      colTypes = Map("id" -> "integer"), ifNotExists = true) ==
      """CREATE TABLE IF NOT EXISTS "s"."t" ("id" integer)""")
    assert(PgCopy.dropTableSql("s", "t") == """DROP TABLE IF EXISTS "s"."t"""")
    intercept[IllegalArgumentException] {
      PgCopy.pgColumnType(ArrayType(LongType))
    }
  }

  test("CSV encoding: NULL vs empty string, quoting, bytes, temporals") {
    assert(PgCopy.csvField(null) == "")             // unquoted empty = NULL
    assert(PgCopy.csvField("") == "\"\"")           // quoted empty = ''
    assert(PgCopy.csvField("plain") == "\"plain\"")
    assert(PgCopy.csvField("a\"b,c\nd") == "\"a\"\"b,c\nd\"")
    assert(PgCopy.csvField(Array[Byte](0, 15, -1)) == "\\x000fff")
    assert(PgCopy.csvField(java.sql.Date.valueOf("2024-02-29")) == "2024-02-29")
    // instants render in UTC with an explicit +00 offset, independent of
    // the executor JVM's default zone (Timestamp.toString is zone-local
    // and suffix-free — the server would re-interpret the wall clock)
    assert(PgCopy.csvField(java.sql.Timestamp.from(
      java.time.Instant.parse("2024-02-29T12:34:56.789Z"))) ==
      "\"2024-02-29 12:34:56.789+00\"")
    assert(PgCopy.csvField(java.time.LocalDateTime.of(2024, 2, 29, 1, 2, 3)) ==
      "\"2024-02-29 01:02:03\"")
    assert(PgCopy.csvField(3.5d) == "3.5")
    assert(PgCopy.csvField(true) == "true")

    val row = Row(1L, null, "x,y", Array[Byte](1))
    assert(PgCopy.csvRecord(row) == "1,,\"x,y\",\\x01")
  }
}
