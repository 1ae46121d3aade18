package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch stage-level profiler for dedup_keep_best (r21): attributes the
  * query's wall across the plant construction, the kernel projection, the
  * members materialization, and the winner/loser joins. Test-scoped tool,
  * not shipped. */
object ProfileKeepBest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_big100x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuTimeListener
    spark.sparkContext.addSparkListener(cpu)

    def timeU(label: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c0 = cpu.cpuNs.get
        body
        org.apache.spark.graftbench.SparkInternals.drainListenerBus(
          spark.sparkContext)
        ((System.nanoTime() - t0) / 1e9, (cpu.cpuNs.get - c0) / 1e9)
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[prof] $label%-34s wall ${ts.map(t => f"${t._1}%6.2f").mkString(" ")}" +
        f"  cpu ${ts.map(t => f"${t._2}%6.1f").mkString(" ")}")
    }
    def time(label: String)(mk: => DataFrame): Unit =
      timeU(label)(mk.write.format("noop").mode("overwrite").save())

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val shadow = base.filter(col("doc_id") < 40)
      .select((col("doc_id") - 4000000L).as("doc_id"),
        regexp_replace(col("text"), lit(" "), lit("  ")).as("text"))
    val copies = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
    def docsOf(spread: Boolean) = {
      val u = base.unionByName(shadow).unionByName(copies)
      val s = if (spread) Dedup.fanOut(u, col("doc_id")) else u
      s.withColumn("norm", TextFunctions.normalizeText(col("text")))
        .withColumn("quality",
          round(TextFunctions.qualityScore(col("text")), 6))
    }

    // stage-level attribution for one full run
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages.add((si.stageId,
            si.name.split("\n").head.take(60), si.numTasks,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L))
        }
      })
    if (args.lift(2).contains("stages")) {
      Dedup.dropNearDuplicatesKeepBest(docsOf(spread = true), "doc_id",
        "norm", "quality", threshold = 1.0, verifyExact = true)
        ._1.select("doc_id")
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graftbench.SparkInternals.drainListenerBus(
        spark.sparkContext)
      stages.toArray(Array.empty[(Int, String, Int, Long, Long)])
        .sortBy(-_._4).take(20).foreach { case (id, n, t, run, cpu) =>
          println(f"[stage] $id%4d tasks=$t%3d run=${run / 1000.0}%8.1fs cpu=${cpu / 1000.0}%8.1fs  $n")
        }
      spark.stop()
      return
    }

    time("raw-union-scan") {
      base.unionByName(shadow).unionByName(copies)
        .select(col("doc_id"), octet_length(col("text")).as("n"))
    }
    time("norm-kernel-only") {
      docsOf(spread = false)
        .select(col("doc_id"), octet_length(col("norm")).as("n"))
    }
    time("norm+quality") {
      docsOf(spread = false)
        .select(col("doc_id"), octet_length(col("norm")).as("n"),
          col("quality"))
    }
    time("norm+quality(spread)") {
      docsOf(spread = true)
        .select(col("doc_id"), octet_length(col("norm")).as("n"),
          col("quality"))
    }
    time("members-proj(spread,sha)") {
      docsOf(spread = true)
        .filter(col("norm").isNotNull && octet_length(col("norm")) >= 5)
        .select(col("doc_id"), unhex(sha2(col("norm"), 256)).as("k"),
          col("quality"))
    }
    timeU("members-ckpt(spread)") {
      docsOf(spread = true)
        .filter(col("norm").isNotNull && octet_length(col("norm")) >= 5)
        .select(col("doc_id"), unhex(sha2(col("norm"), 256)).as("k"),
          col("quality"))
        .localCheckpoint(true)
      ()
    }
    time("full-fastpath(spread)") {
      Dedup.dropNearDuplicatesKeepBest(docsOf(spread = true), "doc_id",
        "norm", "quality", threshold = 1.0, verifyExact = true)
        ._1.select("doc_id")
    }
    time("full-fastpath(unspread)") {
      Dedup.dropNearDuplicatesKeepBest(docsOf(spread = false), "doc_id",
        "norm", "quality", threshold = 1.0, verifyExact = true)
        ._1.select("doc_id")
    }
    spark.stop()
  }
}
