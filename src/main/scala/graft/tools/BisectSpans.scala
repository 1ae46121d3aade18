package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage bisection for `dedup_spans` (r19: the 20×-slower-than-100×
  * inversion) — times each sub-pipeline of [[graft.operators.Dedup
  * .dropSharedSpans]]'s plan as a separate action on a corpus dir, so a
  * data-dependent cliff (explode volume, winner join strategy, rebuild
  * skew) is attributable without touching the operator.
  *
  * Usage: runMain graft.tools.BisectSpans <dir> [reps]
  */
object BisectSpans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cpusInt = scala.util.Try(cpus.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpusInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // the registered query's exact input construction
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val boilers = array(
      lit("terms of service apply to all content on this site"),
      lit("click here to subscribe to our free daily newsletter updates"),
      lit("all rights reserved unauthorized reproduction is strictly prohibited on site"))
    val toks = graft.functions.TextFunctions.wsTokens(col("text"))
    val built = d.select(col("doc_id"),
      concat_ws(" ", concat(
        slice(toks, lit(1), lit(10)),
        split(element_at(boilers, (pmod(col("doc_id"), lit(3)) + 1).cast("int")), " "),
        slice(toks, lit(11), greatest(size(toks) - 10, lit(0))))).as("text"))

    val occ = built
      .select(col("doc_id").as("__id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.expressions.WordWindowHashes(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("text")),
            8)).as("__wh"))
      .select(col("__id"), posexplode(col("__wh")).as(Seq("__idx", "__k")))

    val winners = occ
      .groupBy("__k")
      .agg(min(shiftleft(col("__id") + (1L << 42), 20)
        .bitwiseOR(col("__idx").cast("long"))).as("__w"))
      .select(col("__k"),
        (shiftright(col("__w"), 20) - (1L << 42)).as("__wid"),
        col("__w").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("__widx"))

    val losers = occ.join(winners, Seq("__k"))
      .filter(!(col("__id") === col("__wid") && col("__idx") === col("__widx")))
      .select(col("__id"), col("__idx"))

    val rmLists = losers
      .groupBy("__id")
      .agg(sort_array(collect_list(col("__idx"))).as("__rm"))

    def time(name: String, df: DataFrame): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[bisect] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(s"[bisect] dir=$dir docs=${d.count()} " +
      s"occ_rows=${occ.count()} winners_rows=${winners.count()} " +
      s"losers_rows=${losers.count()}")
    if (args.contains("--plan")) {
      losers.foreach(_ => ()) // drive THIS QueryExecution so AQE finalizes
      println("[bisect] losers executed plan:\n" +
        losers.queryExecution.executedPlan.toString.take(6000))
    }
    time("occ", occ)
    time("winners", winners)
    time("losers", losers)
    time("rmLists", rmLists)
    time("full_query", graft.SparkEntry.queries("dedup_spans")(spark, dir))
    spark.stop()
  }
}
