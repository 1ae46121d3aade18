package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest over the events table.
  *
  * The streaming analog of the reference's batched Arrow streaming
  * (db2pq/files/parquet.py:611 write_record_batch_reader_to_parquet):
  * `readStream` over a parquet directory, watermarked event-time windows,
  * incremental aggregation. `hourlyCountsBatch` is the batch twin of the
  * same computation — used by the correctness oracle, and guaranteed to
  * agree with a completed stream (same logical plan modulo incremental
  * execution).
  */
object EventStream {

  /** Open an unbounded read over a parquet events directory, with
    * ingestion RATE CONTROL (r13): `maxFilesPerTrigger` and/or
    * `maxBytesPerTrigger` bound each micro-batch, which is what keeps a
    * 100 TB backfill from materializing as one giant batch — state-store
    * checkpoints land incrementally, executor memory stays bounded, and
    * a failure loses one bounded trigger instead of the whole replay.
    * `None` disables a knob. Spark's file source accepts AT MOST ONE of
    * the two (`FileStreamOptions` throws "Options 'maxFilesPerTrigger'
    * and 'maxBytesPerTrigger' can't be both set at the same time" — the
    * both-set soft-cap behavior belongs to Delta's source, not this one),
    * so the files knob DEFAULTS to None and the 16-file fallback applies
    * only when NEITHER knob is set — ANY explicitly passed files value
    * alongside bytes is rejected loudly (r15: with a `Some(16)` default
    * an explicit 16 was indistinguishable from "unset" and silently
    * dropped while any other value raised). The operators downstream are
    * trigger-count-agnostic (multi-batch equivalence is spec-pinned in
    * RateControlSpec). */
  def readEvents(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    val effectiveFiles =
      if (maxBytesPerTrigger.isEmpty) maxFilesPerTrigger.orElse(Some(16))
      else {
        require(maxFilesPerTrigger.isEmpty,
          "Spark's file source takes maxFilesPerTrigger OR " +
            "maxBytesPerTrigger, never both — pass maxFilesPerTrigger = " +
            "None when bounding a trigger by bytes")
        None
      }
    val base = spark.readStream.schema(schema)
    val withFiles = effectiveFiles
      .fold(base)(n => base.option("maxFilesPerTrigger", n.toString))
    val withBytes = maxBytesPerTrigger
      .fold(withFiles)(b => withFiles.option("maxBytesPerTrigger", b.toString))
    withBytes.parquet(path)
  }

  /** Watermarked hourly counts/sums per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Batch twin of [[hourlyCounts]] on a static frame (oracle target). */
  def hourlyCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Run the stream over a bounded directory to completion (availableNow)
    * into an in-memory table; returns the result. Used by tests to prove
    * stream/batch agreement. */
  def runToCompletion(spark: SparkSession, path: String, schema: StructType,
      queryName: String = "graft_events"): DataFrame = {
    val q = hourlyCounts(readEvents(spark, path, schema))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a timed-out wait must not hand back a half-populated table with the
    // query still running — fail loudly and release the query
    if (!q.awaitTermination(120000)) {
      q.stop()
      throw new java.util.concurrent.TimeoutException(
        s"stream $queryName did not complete within 120 s")
    }
    spark.table(queryName)
  }
}
