package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming exact deduplication — the ingest-time twin of
  * [[graft.operators.Dedup.exact]] for continuously-arriving corpora.
  *
  * `dropDuplicatesWithinWatermark` keys the dedup state by the given
  * columns and expires each entry once the watermark passes its event
  * time — so state is bounded by the watermark horizon, not by the
  * stream's lifetime (a plain `dropDuplicates` on a stream retains every
  * key forever and OOMs a 100 TB/day ingest). Duplicates arriving within
  * the horizon are suppressed; a reappearance after expiry is re-emitted,
  * which downstream batch dedup (the repo compaction pass) collapses.
  *
  * At scale the dedup key should be a hash of the content, not the
  * content itself ([[hashKey]]), so state entries are 8 bytes + timestamp.
  */
object StreamDedup {

  /** Drop rows whose `keys` repeat within the watermark horizon. */
  def withinWatermark(
      events: DataFrame,
      tsCol: String,
      delay: String,
      keys: Seq[String]
  ): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Content-hash dedup key: 8-byte state entries instead of documents. */
  def hashKey(events: DataFrame, contentCols: Seq[String]): DataFrame = {
    graft.InternalCols.requireAbsent(events, "hashKey", "__dedup_key")
    events.withColumn("__dedup_key",
      org.apache.spark.sql.functions.xxhash64(contentCols.map(col): _*))
  }
}
