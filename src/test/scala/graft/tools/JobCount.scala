package graft.tools

import org.apache.spark.sql.SparkSession

/** Counts Spark jobs and sums sequential job-gap time per named query —
  * the receipt for driver-sequencing (guide §2.6) changes whose wall
  * effect hides in rep noise. Test-scoped tool, not shipped. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("stream_ivf_append"))
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val concurrent = new java.util.concurrent.atomic.AtomicInteger()
    val maxConc = new java.util.concurrent.atomic.AtomicInteger()
    val verbose = args.lift(2).contains("verbose")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val c = concurrent.incrementAndGet()
        maxConc.getAndUpdate(m => math.max(m, c))
        if (verbose) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          starts.put(j.jobId, (System.nanoTime(), desc.take(90)))
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        concurrent.decrementAndGet()
        if (verbose) Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $d")
        }
      }
    })
    // warmup
    try graft.SparkEntry.queries("q1_agg")(s, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      // staging warm-up rep (not counted)
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graftbench.SparkInternals.drainListenerBus(s.sparkContext)
      jobs.set(0); maxConc.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graftbench.SparkInternals.drainListenerBus(s.sparkContext)
      println(f"[jobs] $name%-26s jobs=${jobs.get}%4d maxConcurrent=${maxConc.get}%2d wall=${(System.nanoTime() - t0) / 1e9}%6.2f")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
