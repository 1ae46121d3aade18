package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B for the r7 q_interval_join regression attribution: times
  * the registered query's shape at sf0.1 with (a) the pre-r8 plan (build
  * side left to Catalyst) and (b) the r8 pinned intervals-side broadcast.
  * Test-scoped tool, not shipped; run via Test/runMain graft.tools.IntervalAB.
  */
object IntervalAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def campaignsAndEvents(): (DataFrame, DataFrame) = {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val campaigns = orders.filter(col("o_orderkey") % 997 === 0).select(
        col("o_orderkey").as("campaign_id"),
        date_add(lit("2024-01-01").cast("date"),
          (col("o_orderkey") % 28).cast("int")).as("start_day"),
        date_add(lit("2024-01-01").cast("date"),
          (col("o_orderkey") % 28).cast("int") + lit(7)).as("end_day"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val tsNtz = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
        case _ => col("ts").cast("timestamp_ntz")
      }
      val events = raw.select(to_date(tsNtz).as("day"), col("value"))
      (campaigns, events)
    }

    def bucketOf(c: org.apache.spark.sql.Column) = floor(unix_date(to_date(c)) / 1)

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy("campaign_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0, 0).cast("bigint")).as("value_cents"))

    def time(label: String)(mk: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label%-16s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }

    val (campaigns, events) = campaignsAndEvents()
    val binned = campaigns.withColumn("__bucket",
      explode(sequence(bucketOf(col("start_day")), bucketOf(col("end_day")))))
    val pts = events.withColumn("__bucket", bucketOf(col("day")))
    val residual = col("day") >= col("start_day") && col("day") <= col("end_day")

    // warmup
    agg(pts.join(broadcast(binned), "__bucket").filter(residual)).write
      .format("noop").mode("overwrite").save()

    time("catalyst-choice") { agg(pts.join(binned, "__bucket").filter(residual)) }
    time("pin-intervals")   { agg(pts.join(broadcast(binned), "__bucket").filter(residual)) }
    val plan = agg(pts.join(binned, "__bucket").filter(residual))
    plan.queryExecution.executedPlan.executeCollect()
    val p = plan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    println("[ab] catalyst-choice build side: " +
      (if (p.contains("BuildLeft")) "BuildLeft (points)" else "BuildRight (intervals)"))
    spark.stop()
  }
}
