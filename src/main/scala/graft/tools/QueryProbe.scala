package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc wall-time probe for registered queries on any corpus dir —
  * the quick loop for profiling one query's scale behavior without a
  * full Bench run (which times the whole registry plus both scale
  * sections). Times each named query rep times (default 3) with a noop
  * sink, printing one line per rep; read minimums, the box shows
  * transient load excursions.
  *
  * Usage: runMain graft.tools.QueryProbe <dir> <q1,q2,...> [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q1_agg").split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // same SPARK_GRAFT_CPUS convention AND default as Bench/Verify, so
    // probe timings are comparable to the bench numbers they pre-screen
    // even when the env var is unset
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
    names.foreach { name =>
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
