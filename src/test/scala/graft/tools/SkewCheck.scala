package graft.tools

import org.apache.spark.sql.SparkSession

/** Verdict-r20 #8 evidence: runs the hinted-SHJ dedup queries against a
  * corpus (the zipf-skew 20× corpus is the adversarial case: equal-text
  * groups to 201 members, a 101-member identical-vector clique) and
  * records, for every stage, the MAX vs MEDIAN task duration and the
  * peak task count — a skewed hinted join shows up as one task holding
  * the stage (guide §2.5's 5–10× max/median alarm). Test-scoped tool. */
object SkewCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1skew")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("dedup_spans", "dedup_minhash", "dedup_simhash",
        "dedup_drop", "dedup_keep_best", "pipeline_curate"))
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskMs.computeIfAbsent(te.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(te.taskInfo.duration)
      }
    })
    names.foreach { name =>
      taskMs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graftbench.SparkInternals.drainListenerBus(s.sparkContext)
      val wall = (System.nanoTime() - t0) / 1e9
      // the 5 heaviest stages by max task time, with max/median ratio
      val rows = scala.jdk.CollectionConverters.MapHasAsScala(taskMs).asScala
        .map { case (sid, q) =>
          val ds = scala.jdk.CollectionConverters.CollectionHasAsScala(q)
            .asScala.toSeq.sorted
          (sid, ds.size, ds.last, ds(ds.size / 2))
        }.toSeq.sortBy(-_._3).take(5)
      val detail = rows.map { case (sid, n, mx, med) =>
        f"stage$sid(n=$n max=${mx}ms med=${med}ms r=${if (med > 0) mx.toDouble / med else -1}%.1f)"
      }.mkString(" ")
      val worst = rows.map { case (_, _, mx, med) =>
        if (med > 0) mx.toDouble / med else 1.0 }.maxOption.getOrElse(1.0)
      println(f"[skew] $name%-18s wall=$wall%6.2f worst max/med=$worst%5.1f  $detail")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
