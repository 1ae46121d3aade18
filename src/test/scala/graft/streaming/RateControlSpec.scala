package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r13: ingestion rate control on the file-source streaming paths. A
  * 100 TB backfill must not materialize as one giant micro-batch — the
  * bounded trigger (`maxFilesPerTrigger`) must run MANY batches and land
  * the same result the unbounded replay does. */
class RateControlSpec extends SparkSpec {
  import graft.streaming.StatefulSessionize.{ClosedSession, TsEvent, closedSessions}

  /** Stage the events as `n` single-file parquet chunks in EVENT-TIME
    * order with strictly ascending mtimes, so the file source's
    * per-trigger admission replays them as an in-order stream (the shape
    * a date-partitioned backfill feeds a zero-delay watermark; unordered
    * chunks would be legitimate watermark-dropped late data, a different
    * test). Returns the stream dir. */
  private def stageChunked(n: Int): String = {
    val src = Files.createTempDirectory("graft_rate").toString
    val ev = eventsTable().select(col("user_id").cast("long").as("user_id"),
      date_trunc("second", col("ts").cast("timestamp")).as("ts"))
    val chunked = ev
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "user_id")))
      .withColumn("__chunk", pmod((col("__rn") - 1) * n /
        lit(math.max(1L, ev.count())), lit(n)).cast("int"))
    val dataDir = Paths.get(src, "data")
    Files.createDirectories(dataDir)
    (0 until n).foreach { i =>
      val tmp = Paths.get(src, s"tmp_$i")
      chunked.filter(col("__chunk") === i).drop("__rn", "__chunk")
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dest = dataDir.resolve(f"chunk_$i%03d.parquet")
      Files.move(part, dest)
      // strictly ascending mtimes pin the source's admission order
      dest.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    dataDir.toString
  }

  test("closedSessions under maxFilesPerTrigger=1 runs >2 micro-batches, " +
    "matches the unbounded replay, and reports state-store metrics") {
    import spark.implicits._
    val dataDir = stageChunked(6)
    val schema = org.apache.spark.sql.Encoders.product[TsEvent].schema

    def run(maxFiles: Option[Int]): (Set[(Long, Long, Long, Long)], Int, Long) = {
      val name = s"rate_${maxFiles.getOrElse(0)}_${System.nanoTime()}"
      val stream = EventStream.readEvents(spark, dataDir, schema,
        maxFilesPerTrigger = maxFiles).as[TsEvent]
      val q = closedSessions(stream, gapSeconds = 1800)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        val stateRows = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsUpdated)).sum
        val rows = spark.table(name).as[ClosedSession].collect()
          .map(s => (s.user_id, s.start_epoch, s.end_epoch, s.n_events)).toSet
        (rows, dataBatches, stateRows)
      } finally q.stop()
    }

    val (bounded, boundedBatches, boundedStateRows) = run(Some(1))
    val (unbounded, unboundedBatches, _) = run(None)

    assert(boundedBatches > 2,
      s"expected >2 data batches under maxFilesPerTrigger=1, got $boundedBatches")
    assert(unboundedBatches <= 2, // one data batch (+ no-data wm batches)
      s"unbounded replay unexpectedly split: $unboundedBatches")
    assert(bounded.nonEmpty && bounded == unbounded,
      s"bounded (${bounded.size} sessions) != unbounded (${unbounded.size})")
    // state-store metrics are recorded per progress event — the
    // observability a long backfill monitors
    assert(boundedStateRows > 0,
      "expected state operator progress (numRowsUpdated) to be recorded")
  }

  test("maxBytesPerTrigger also bounds the replay and agrees") {
    import spark.implicits._
    val dataDir = stageChunked(4)
    val schema = org.apache.spark.sql.Encoders.product[TsEvent].schema
    val name = s"rate_bytes_${System.nanoTime()}"
    // chunk files are tens of KB: a 1-byte budget admits one file per
    // trigger (admission always takes at least one file)
    val stream = EventStream.readEvents(spark, dataDir, schema,
      maxFilesPerTrigger = None, maxBytesPerTrigger = Some(1L)).as[TsEvent]
    val q = closedSessions(stream, gapSeconds = 1800)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 4, s"expected >=4 data batches under a byte budget, got $batches")
    assert(spark.table(name).count() > 0)
  }

  test("ANY explicit maxFilesPerTrigger alongside maxBytesPerTrigger is " +
    "rejected — 16 no longer aliases the unset default") {
    val schema = org.apache.spark.sql.Encoders.product[TsEvent].schema
    val e = intercept[IllegalArgumentException] {
      EventStream.readEvents(spark, "/tmp/unused", schema,
        maxFilesPerTrigger = Some(16), maxBytesPerTrigger = Some(1L))
    }
    assert(e.getMessage.contains("never both"), e.getMessage)
  }
}
