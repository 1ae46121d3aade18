package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class ColumnFilterSpec extends AnyFunSuite {
  val cols = Seq("l_orderkey", "l_partkey", "l_comment", "o_orderkey")

  test("no patterns keeps everything") {
    assert(ColumnFilter.select(cols) == cols)
  }
  test("keep filters by regex search") {
    assert(ColumnFilter.select(cols, keep = Seq("^l_")) ==
      Seq("l_orderkey", "l_partkey", "l_comment"))
  }
  test("drop applies before keep") {
    assert(ColumnFilter.select(cols, keep = Seq("key"), drop = Seq("part")) ==
      Seq("l_orderkey", "o_orderkey"))
  }
  test("multiple patterns union") {
    assert(ColumnFilter.select(cols, keep = Seq("comment", "part")) ==
      Seq("l_partkey", "l_comment"))
  }
  test("empty selection is an error") {
    assertThrows[IllegalArgumentException] {
      ColumnFilter.select(cols, keep = Seq("zzz"))
    }
  }
  test("invalid regex is an error") {
    assertThrows[IllegalArgumentException] {
      ColumnFilter.select(cols, keep = Seq("[unclosed"))
    }
  }
}

class TypesSpec extends AnyFunSuite {
  test("postgres aliases normalize to Spark DDL") {
    assert(Types.normalize("int4") == "int")
    assert(Types.normalize("INT8 ") == "bigint")
    assert(Types.normalize("double precision") == "double")
    assert(Types.normalize("character varying") == "string")
    assert(Types.normalize("bytea") == "binary")
    assert(Types.normalize("timestamp without time zone") == "timestamp")
  }
  test("unknown types pass through") {
    assert(Types.normalize("decimal(12,2)") == "decimal(12,2)")
  }
  test("spark to postgres mapping") {
    assert(Types.toPostgres("int32") == "integer")
    assert(Types.toPostgres("string") == "text")
    assert(Types.toPostgres("float64") == "double precision")
  }
  test("boolean detection") {
    assert(Types.isBoolean("bool") && Types.isBoolean("BOOLEAN"))
    assert(!Types.isBoolean("int4"))
  }
}
