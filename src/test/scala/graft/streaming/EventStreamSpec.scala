package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  test("stream over bounded input agrees with the batch twin") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // events carries TIMESTAMP(NANOS): stage a micros copy for the stream
    val staged = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    events.write.mode("overwrite").parquet(staged)

    val static = spark.read.parquet(staged)
    val batch = EventStream.hourlyCountsBatch(static)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet

    val streamed = EventStream.runToCompletion(spark, staged, static.schema,
      queryName = s"graft_events_${System.nanoTime()}")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream lands in a parquet sink (repo-layout ingest path)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
