package graft.plans

import org.apache.spark.sql.types._
import graft.SparkSpec

class TablePlanSparkSpec extends SparkSpec {

  lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("keep/drop + where + rename + cast compose") {
    val plan = TablePlan(
      keep = Seq("^l_(orderkey|quantity|returnflag)$"),
      rename = Map("l_returnflag" -> "flag"),
      colTypes = Map("l_quantity" -> "int4"),
      where = Some("l_quantity > 30")
    )
    val out = plan(lineitem)
    assert(out.columns.toSeq == Seq("l_orderkey", "l_quantity", "flag"))
    assert(out.schema("l_quantity").dataType == IntegerType)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) > 30))
  }

  test("obs limits rows") {
    assert(TablePlan(obs = Some(7))(lineitem).count() == 7)
  }

  test("duplicate rename outputs rejected") {
    val plan = TablePlan(rename = Map("l_orderkey" -> "x", "l_partkey" -> "x"))
    assertThrows[IllegalArgumentException] { plan(lineitem) }
  }

  test("col_types must target selected output columns") {
    val plan = TablePlan(keep = Seq("^l_orderkey$"), colTypes = Map("nope" -> "int"))
    assertThrows[IllegalArgumentException] { plan(lineitem) }
  }

  test("safe boolean cast normalizes encodings, nulls the rest") {
    import spark.implicits._
    val df = Seq("t", "TRUE", "1", "1.0", "yes", "f", "0", "no", "garbage")
      .toDF("v")
    val out = TablePlan(colTypes = Map("v" -> "bool"))(df)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq == Seq(Some(true), Some(true), Some(true), Some(true),
      Some(true), Some(false), Some(false), Some(false), None))
  }

  test("naive timestamps interpreted in tz then normalized to UTC") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("2024-06-01T12:00:00").toDF("s")
      .select(to_timestamp_ntz($"s").as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = TablePlan(tz = Some("America/New_York"))(df)
    assert(out.schema("ts").dataType == TimestampType)
    val epoch = out.select(unix_timestamp($"ts")).as[Long].head()
    // 12:00 EDT (UTC-4) = 16:00 UTC
    assert(epoch == java.time.Instant.parse("2024-06-01T16:00:00Z").getEpochSecond)
  }

  test("tz normalization is session-timezone independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the NTZ→TS cast binds the session zone; the plan must cancel it —
    // under a non-UTC session the naive apply() shifted every instant by
    // the session offset while the SQL pushdown rendering did not
    val df = Seq("2024-06-01T12:00:00").toDF("s")
      .select(to_timestamp_ntz($"s").as("ts"))
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    try {
      for (sessionTz <- Seq("UTC", "America/New_York", "Asia/Tokyo")) {
        spark.conf.set(key, sessionTz)
        val out = TablePlan(tz = Some("UTC"))(df)
        val epoch = out.select(unix_timestamp($"ts")).as[Long].head()
        assert(epoch ==
          java.time.Instant.parse("2024-06-01T12:00:00Z").getEpochSecond,
          s"session $sessionTz shifted the instant")
      }
    } finally spark.conf.set(key, prev)
  }

  test("obs beyond Int.MaxValue is rejected, not truncated") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("a")
    val e = intercept[IllegalArgumentException] {
      TablePlan(obs = Some(5000000000L))(df)
    }
    assert(e.getMessage.contains("obs row limit"))
  }

  test("numericMode casts uncovered decimal columns; explicit colTypes wins") {
    import spark.implicits._
    val df = Seq((1L, BigDecimal("12.34"), BigDecimal("56.78")))
      .toDF("id", "a", "b")
      .select($"id", $"a".cast("decimal(12,2)"), $"b".cast("decimal(12,2)"))
    val out = TablePlan(numericMode = Some("float64"),
      colTypes = Map("b" -> "text"))(df)
    assert(out.schema("a").dataType == DoubleType)
    assert(out.schema("b").dataType == StringType)
    assert(out.schema("id").dataType == LongType)
    val textOut = TablePlan(numericMode = Some("text"))(df)
    assert(textOut.schema("a").dataType == StringType)
    val keepOut = TablePlan(numericMode = Some("decimal"))(df)
    assert(keepOut.schema("a").dataType.isInstanceOf[DecimalType])
    assertThrows[IllegalArgumentException] {
      TablePlan(numericMode = Some("bogus"))
    }
  }

  test("filter and projection reach the parquet scan (pushdown audit)") {
    val plan = TablePlan(keep = Seq("^l_(orderkey|quantity)$"),
      where = Some("l_quantity > 30"))
    val physical = plan(lineitem).queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed:\n$physical")
    assert(physical.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$physical")
  }

  test("JDBC pushdown SQL renders projection, casts, tz, where, limit") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("ts", TimestampNTZType),
      StructField("flag", StringType)))
    val plan = TablePlan(
      drop = Seq("^name$"),
      rename = Map("id" -> "ident"),
      colTypes = Map("ident" -> "int8", "flag" -> "bool"),
      where = Some("id > 10"),
      obs = Some(100),
      tz = Some("UTC"))
    val sql = plan.toSelectSql("crsp", "dsi", schema)
    assert(sql.contains(""""id"::bigint AS "ident""""))
    assert(sql.contains("""("ts" AT TIME ZONE 'UTC') AS "ts""""))
    assert(sql.contains("CASE WHEN \"flag\" IS NULL THEN NULL"))
    assert(sql.contains("""FROM "crsp"."dsi" WHERE id > 10 LIMIT 100"""))
    assert(!sql.contains("name"))
  }
}

class TablePlanErrorSpec extends graft.SparkSpec {
  import graft.plans.TablePlan
  lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("where referencing a missing column fails with analysis error") {
    val e = intercept[Exception] { TablePlan(where = Some("no_such_col > 1"))(li).collect() }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("malformed where SQL fails at parse") {
    assertThrows[Exception] { TablePlan(where = Some("l_quantity >>> 1"))(li).collect() }
  }

  test("cast to an invalid type name fails clearly") {
    assertThrows[Exception] {
      TablePlan(colTypes = Map("l_quantity" -> "not_a_type"))(li).collect()
    }
  }
}
