package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  test("stream over bounded input agrees with the batch twin") {
    // stage a micros copy for the stream (ts normalized across testdata
    // generations by eventsTable)
    val staged = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // watermarks require TIMESTAMP (ltz): stage the ntz-normalized ts as ltz
    val events = eventsTable().withColumn("ts", col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(staged)

    val static = spark.read.parquet(staged)
    val batch = EventStream.hourlyCountsBatch(static)
      .collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2)))
      .toSet

    val streamed = EventStream.runToCompletion(spark, staged, static.schema,
      queryName = s"graft_events_${System.nanoTime()}")
      .collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2)))
      .toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream lands in a parquet sink (repo-layout ingest path)") {
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val events = eventsTable().withColumn("ts", col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(staged)
    val static = spark.read.parquet(staged)

    val q = EventStream.readEvents(spark, staged, static.schema)
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(sink).count() == static.count())
  }
}

class ClosedSessionsSpec extends graft.SparkSpec {
  import graft.streaming.StatefulSessionize._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  test("sessions close by gap and by watermark timeout, emitted exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val name = s"closed_${System.nanoTime()}"
    val q = closedSessions(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(TsEvent(1, ts(100)), TsEvent(1, ts(130)))
      q.processAllAvailable()
      // same key past the gap: closes the first session inline
      input.addData(TsEvent(1, ts(10000)))
      q.processAllAvailable()
      // advance watermark far past 10000+60 so the open session times out
      input.addData(TsEvent(2, ts(20000)))
      q.processAllAvailable()
      input.addData(TsEvent(2, ts(20001)))
      q.processAllAvailable()

      val rows = spark.table(name).as[ClosedSession].collect().toSet
      assert(rows.contains(ClosedSession(1, 100, 130, 2)), rows.toString)
      assert(rows.contains(ClosedSession(1, 10000, 10000, 1)), rows.toString)
      // no duplicates
      assert(rows.size == spark.table(name).count())
    } finally q.stop()
  }

  test("a late event within the watermark delay opens its own earlier " +
    "session instead of merging into the open one") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val name = s"late_${System.nanoTime()}"
    val q = closedSessions(input.toDS(), gapSeconds = 60,
      watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(TsEvent(1, ts(1000)))
      q.processAllAvailable()
      // LATE by arrival order but inside the delay: must become its own
      // earlier session — single-session state merged it into [1000,1000]
      // (t - last <= gap holds for arbitrarily old t)
      input.addData(TsEvent(1, ts(100)))
      q.processAllAvailable()
      // push the watermark far past both close times
      input.addData(TsEvent(2, ts(100000)))
      q.processAllAvailable()
      input.addData(TsEvent(2, ts(100001)))
      q.processAllAvailable()
      val rows = spark.table(name).as[ClosedSession].collect().toSet
      assert(rows.contains(ClosedSession(1, 100, 100, 1)), rows.toString)
      assert(rows.contains(ClosedSession(1, 1000, 1000, 1)), rows.toString)
      assert(rows.size == spark.table(name).count())
    } finally q.stop()
  }

  test("registered closed_sessions query equals batch gap-sessionization " +
    "minus the open tails (the driver-oracle identity)") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.SparkEntry.queries("closed_sessions")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val e = eventsTable().select(col("user_id").cast("long").as("user_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("t"))
    val w = Window.partitionBy("user_id").orderBy("t")
    val sess = e
      .withColumn("prev", lag("t", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("t") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("t").as("start_epoch"), max("t").as("end_epoch"),
        count(lit(1)).as("n_events"))
    val maxT = e.agg(max("t")).head.getLong(0)
    val expected = sess.filter(col("end_epoch") + 1800 < maxT)
      .select("user_id", "start_epoch", "end_epoch", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(got.nonEmpty)
    assert(got == expected)
  }
}

class StreamTopKSpec extends graft.SparkSpec {
  import graft.streaming.StreamTopK._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  test("per-window top-k emits once when the watermark closes the window; " +
    "equals the batch twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val name = s"tk_${System.nanoTime()}"
    val q = topKPerWindow(input.toDS(), windowSeconds = 3600, k = 2)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val firstWindow = Seq(
        TypedEvent("click", ts(100)), TypedEvent("click", ts(200)),
        TypedEvent("view", ts(300)), TypedEvent("view", ts(400)),
        TypedEvent("view", ts(500)), TypedEvent("error", ts(600)))
      input.addData(firstWindow: _*)
      q.processAllAvailable()
      // window [0, 3600) is still open: nothing may be emitted yet
      assert(spark.table(name).count() == 0)

      // a later-window event advances the watermark past 3600; the timeout
      // fires on the following trigger (watermark is batch-lagged)
      input.addData(TypedEvent("click", ts(10000)))
      q.processAllAvailable()
      input.addData(TypedEvent("view", ts(10001)))
      q.processAllAvailable()

      val rows = spark.table(name).as[TopEntry].collect().toSet
      assert(rows == Set(TopEntry(0, "view", 3, 1), TopEntry(0, "click", 2, 2)),
        rows.toString)
      assert(rows.size == spark.table(name).count()) // exactly once

      // the batch twin of the closed window produces the same rows
      val batchRows = topKBatch(
        firstWindow.map(e => (e.event_type, e.ts)).toDF("event_type", "ts"),
        "ts", "event_type", windowSeconds = 3600, k = 2)
        .as[TopEntry].collect().toSet
      assert(batchRows == rows)
    } finally q.stop()
  }
}

class StreamTopKCapSpec extends graft.SparkSpec {
  import graft.streaming.StreamTopK._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  test("maxKeysPerWindow caps state via space-saving; heavy hitters of a " +
    "skewed stream stay exact") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val name = s"tkcap_${System.nanoTime()}"
    // cap of 3 state entries; two dominant keys, a tail that churns the
    // remaining slot
    val q = topKPerWindow(input.toDS(), windowSeconds = 3600, k = 2,
      maxKeysPerWindow = 3)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // dominants first (occupy + grow their slots), tail churns slot 3
      input.addData(Seq.fill(5)(TypedEvent("hot1", ts(100))) ++
        Seq.fill(4)(TypedEvent("hot2", ts(200))): _*)
      q.processAllAvailable()
      input.addData(TypedEvent("cold_a", ts(300)), TypedEvent("cold_b", ts(400)),
        TypedEvent("cold_c", ts(500)))
      q.processAllAvailable()
      // close the window
      input.addData(TypedEvent("x", ts(10000)))
      q.processAllAvailable()
      input.addData(TypedEvent("x", ts(10001)))
      q.processAllAvailable()

      val rows = spark.table(name).as[TopEntry].collect()
      // state never exceeded 3 entries, yet the two heavy hitters emerge
      // with their EXACT counts (they were never eviction victims)
      assert(rows.toSet == Set(
        TopEntry(0, "hot1", 5, 1), TopEntry(0, "hot2", 4, 2)), rows.mkString(","))
    } finally q.stop()
  }

  test("below the cap the capped operator is exact (agrees with batch twin)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val name = s"tkuncap_${System.nanoTime()}"
    val events = Seq(
      TypedEvent("a", ts(100)), TypedEvent("a", ts(200)),
      TypedEvent("b", ts(300)), TypedEvent("c", ts(400)))
    val q = topKPerWindow(input.toDS(), windowSeconds = 3600, k = 3,
      maxKeysPerWindow = 3)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(TypedEvent("x", ts(10000)))
      q.processAllAvailable()
      input.addData(TypedEvent("x", ts(10001)))
      q.processAllAvailable()
      val rows = spark.table(name).as[TopEntry].collect().toSet
      val batch = topKBatch(
        events.map(e => (e.event_type, e.ts)).toDF("event_type", "ts"),
        "ts", "event_type", 3600, 3).as[TopEntry].collect().toSet
      assert(rows == batch, rows.toString)
    } finally q.stop()
  }
}

class RocksDBStateSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  private def withRocksDB[T](body: => T): T = {
    graft.streaming.StateBackend.useRocksDB(spark)
    try body finally graft.streaming.StateBackend.useDefault(spark)
  }

  test("closedSessions runs multi-batch on the RocksDB state store " +
    "with identical results") {
    import graft.streaming.StatefulSessionize._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    withRocksDB {
      val input = MemoryStream[TsEvent]
      val name = s"rdb_sess_${System.nanoTime()}"
      val q = closedSessions(input.toDS(), gapSeconds = 60)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // no assertion on q.lastProgress here: a zero-data batch 0 may or
        // may not have completed yet, and its progress carries empty
        // stateOperators — the custom-metrics check below is the real
        // proof the query ran on RocksDB
        input.addData(TsEvent(1, ts(100)), TsEvent(1, ts(130)))
        q.processAllAvailable()
        input.addData(TsEvent(1, ts(10000)))
        q.processAllAvailable()
        input.addData(TsEvent(2, ts(20000)))
        q.processAllAvailable()
        input.addData(TsEvent(2, ts(20001)))
        q.processAllAvailable()
        val rows = spark.table(name).as[ClosedSession].collect().toSet
        assert(rows.contains(ClosedSession(1, 100, 130, 2)), rows.toString)
        assert(rows.contains(ClosedSession(1, 10000, 10000, 1)), rows.toString)
        assert(rows.size == spark.table(name).count())
        // the query really ran on RocksDB, not the default provider
        val provider = q.lastProgress.stateOperators.head
          .customMetrics
        assert(provider.containsKey("rocksdbFilesCopied") ||
          provider.containsKey("rocksdbBytesCopied"),
          s"expected RocksDB custom metrics, got ${provider.keySet()}")
      } finally q.stop()
    }
  }

  test("stream_topk runs multi-batch on RocksDB with identical results") {
    import graft.streaming.StreamTopK._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    withRocksDB {
      val input = MemoryStream[TypedEvent]
      val name = s"rdb_tk_${System.nanoTime()}"
      val q = topKPerWindow(input.toDS(), windowSeconds = 3600, k = 2)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(
          TypedEvent("click", ts(100)), TypedEvent("click", ts(200)),
          TypedEvent("view", ts(300)), TypedEvent("view", ts(400)),
          TypedEvent("view", ts(500)), TypedEvent("error", ts(600)))
        q.processAllAvailable()
        input.addData(TypedEvent("x", ts(10000)))
        q.processAllAvailable()
        input.addData(TypedEvent("x", ts(10001)))
        q.processAllAvailable()
        val rows = spark.table(name).as[TopEntry].collect().toSet
        assert(rows == Set(TopEntry(0, "view", 3, 1), TopEntry(0, "click", 2, 2)),
          rows.toString)
      } finally q.stop()
    }
  }

  test("stream_dedup runs multi-batch on RocksDB with identical results") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    withRocksDB {
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val name = s"rdb_sd_${System.nanoTime()}"
      val q = graft.streaming.StreamDedup.withinWatermark(
        input.toDF().toDF("doc_id", "ts", "text"),
        tsCol = "ts", delay = "10 minutes", keys = Seq("doc_id"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData((1L, ts(100), "a"), (2L, ts(110), "b"))
        q.processAllAvailable()
        input.addData((1L, ts(120), "a-dup"), (3L, ts(130), "c"))
        q.processAllAvailable()
        val rows = spark.table(name).collect()
        assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      } finally q.stop()
    }
  }

  test("stream_neardup runs multi-batch on RocksDB with identical results") {
    import graft.streaming.StreamNearDup._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running far beyond the quiet river all afternoon"
    withRocksDB {
      val input = MemoryStream[DocEvent]
      val name = s"rdb_nd_${System.nanoTime()}"
      val q = pairsPerWindow(input.toDS(), windowSeconds = 3600,
        shingleK = 5, numHashes = 48, bands = 12, threshold = 0.3)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(DocEvent(1L, base, ts(100)), DocEvent(2L, base, ts(200)),
          DocEvent(3L, base + " tired", ts(300)))
        q.processAllAvailable()
        input.addData(DocEvent(-1L, "sentinel advance one", ts(100000)))
        q.processAllAvailable()
        input.addData(DocEvent(-2L, "sentinel advance two", ts(100001)))
        q.processAllAvailable()
        val rows = spark.table(name).as[NearDupPair].collect()
        // r17 contract: every LIVE colliding band emits the pair (≤ bands
        // copies, one micro-batch), collapsed downstream by a plain
        // distinct — assert on the distinct set plus the multiplicity cap
        val set = rows.toSet
        assert(set.exists(p => p.id_a == 1L && p.id_b == 2L && p.est_jaccard == 1.0),
          rows.mkString(","))
        assert(set.count(p => p.id_b == 3L) == 2, rows.mkString(","))
        val mult = rows.groupBy(identity).map(_._2.length)
        assert(mult.max <= 12, s"pair emitted more than bands times: $mult")
      } finally q.stop()
    }
  }
}

class StreamJoinSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  test("stream-stream interval join correlates within the window, watermark-bounded") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val name = s"sj_${System.nanoTime()}"

    val c = clicks.toDF().toDF("user_id", "cts").withWatermark("cts", "10 seconds")
    val b = buys.toDF().toDF("buser_id", "bts").withWatermark("bts", "10 seconds")
    val q = graft.streaming.StreamJoin.within(c, b,
      "user_id", "buser_id", "cts", "bts", maxDelaySeconds = 3600)
      .select("user_id", "cts", "bts")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      clicks.addData((1L, ts(1000)), (2L, ts(1000)))
      buys.addData((1L, ts(2000)))    // within 1h of click → joins
      buys.addData((2L, ts(9000)))    // 8000s later → outside window
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L)
    } finally q.stop()
  }

  test("same operator on static frames is a plain interval join") {
    import spark.implicits._
    val c = Seq((1L, ts(1000)), (2L, ts(1000))).toDF("user_id", "cts")
    val b = Seq((1L, ts(2000)), (2L, ts(9000))).toDF("buser_id", "bts")
    val out = graft.streaming.StreamJoin.within(c, b,
      "user_id", "buser_id", "cts", "bts", 3600).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
  }
}

class StreamDedupSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  test("dropDuplicatesWithinWatermark suppresses dups across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val name = s"sd_${System.nanoTime()}"

    val deduped = graft.streaming.StreamDedup.withinWatermark(
      input.toDF().toDF("doc_id", "ts", "text"),
      tsCol = "ts", delay = "10 minutes", keys = Seq("doc_id"))
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, ts(100), "a"), (2L, ts(110), "b"))
      q.processAllAvailable()
      // duplicate keys inside the watermark horizon, same and later batch
      input.addData((1L, ts(120), "a-dup"), (3L, ts(130), "c"), (3L, ts(131), "c-dup"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("hashKey dedups by content hash: 8-byte state, not documents") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val name = s"sdh_${System.nanoTime()}"

    val keyed = graft.streaming.StreamDedup.hashKey(
      input.toDF().toDF("doc_id", "ts", "text"), Seq("text"))
    val q = graft.streaming.StreamDedup.withinWatermark(
      keyed, "ts", "10 minutes", Seq("__dedup_key"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // different ids, identical content -> one survivor
      input.addData((1L, ts(100), "same text"), (2L, ts(101), "same text"),
        (3L, ts(102), "other text"))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length == 2)
      assert(rows.map(r => r.getString(2)).sorted.toSeq ==
        Seq("other text", "same text"))
    } finally q.stop()
  }
}
