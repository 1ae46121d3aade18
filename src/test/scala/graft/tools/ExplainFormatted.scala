package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Round-20 plan receipts: dumps `explain("formatted")` of named
  * SparkEntry queries to `<outDir>/<query>_<suffix>.txt` — the
  * before/after evidence the optimization rounds commit under
  * `plans/r20/`. Unlike ExplainDump (compact executed trees for ALL
  * queries), this keeps the full formatted operator list + details
  * (PushedFilters, ReadSchema, join build sides) for the queries a
  * change touched.
  *
  * Usage: runMain graft.tools.ExplainFormatted <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object ExplainFormatted {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("plans/r20")
    val suffix = args.lift(2).getOrElse("before")
    val names: Seq[String] = args.lift(3) match {
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None      => SparkEntry.queries.keys.toSeq.sorted
    }
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val body =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          // execute first so AQE's final plan (exchange reuse, coalesced
          // reads, runtime join strategy) is what lands in the receipt
          df.queryExecution.executedPlan.executeCollect()
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), body)
      println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
