package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler for the optimization rounds (not part of
  * the shipped surface): times a named subset of `SparkEntry.queries`
  * through the same noop-sink methodology as the bench, reporting wall
  * seconds AND executor CPU seconds per repetition so a change's effect
  * is attributable without a full 127-query bench run. Run via
  * `sbt "Test/runMain graft.tools.ProfileQueries <dir> <q1,q2,...> [reps]"`. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] = args.lift(1) match {
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None      => graft.SparkEntry.queries.keys.toSeq
    }
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpusInt = scala.util.Try(cpus.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val s = SparkSession.builder()
      .appName("profile-queries")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpusInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuTimeListener
    s.sparkContext.addSparkListener(cpu)
    def drop(): Unit = {
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      s.catalog.clearCache()
    }
    // warmup: JIT + codegen + parquet footer caches (bench does the same)
    try graft.SparkEntry.queries("q1_agg")(s, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c0 = cpu.cpuNs.get
        s.sparkContext.setJobDescription(name)
        graft.SparkEntry.queries(name)(s, dir)
          .write.format("noop").mode("overwrite").save()
        org.apache.spark.graftbench.SparkInternals.drainListenerBus(s.sparkContext)
        ((System.nanoTime() - t0) / 1e9, (cpu.cpuNs.get - c0) / 1e9)
      }
      drop()
      val w = times.map(_._1)
      val c = times.map(_._2)
      println(f"[prof] $name%-28s wall ${w.map(v => f"$v%6.2f").mkString(" ")}" +
        f"  min ${w.min}%6.2f  cpu ${c.map(v => f"$v%6.1f").mkString(" ")}")
    }
    s.stop()
  }
}
