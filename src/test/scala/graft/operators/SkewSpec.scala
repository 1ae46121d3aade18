package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  lazy val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")

  test("saltedAgg equals the unsalted aggregation") {
    val salted = Skew.saltedAgg(lineitem, Seq("l_returnflag"),
      Map("sum_qty" -> col("l_quantity")), numSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the unsalted inner join") {
    val salted = Skew.saltedJoin(lineitem, supplier, "l_suppkey", "s_suppkey",
      numSalts = 8)
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = lineitem.join(supplier,
      lineitem("l_suppkey") === supplier("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain && salted.nonEmpty)
  }
}

class StatefulSessionizeSpec extends SparkSpec {
  import graft.streaming.StatefulSessionize
  import spark.implicits._

  test("stateful assignment matches window-based sessionize on static data") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"),
        (expr("ts div 1000000000")).as("ts_epoch"))
      .as[StatefulSessionize.EventIn]

    val stateful = StatefulSessionize.assign(events, 1800)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val eventsTs = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), timestamp_seconds(expr("ts div 1000000000")).as("ts"))
    val windowed = Sessionize.byGap(eventsTs, "user_id", "ts", 1800)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(stateful == windowed && stateful.nonEmpty)
  }
}
