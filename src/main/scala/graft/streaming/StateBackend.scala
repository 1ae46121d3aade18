package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming operators
  * ([[StatefulSessionize]], [[StreamDedup]], [[StreamTopK]]).
  *
  * The default HDFS-backed provider keeps every partition's state map ON
  * HEAP — fine for enumerable key domains, but a high-cardinality keyed
  * stream (user ids, document hashes) grows executor heap with the key
  * count until GC pressure or OOM. RocksDB keeps state off-heap with
  * incremental checkpointing, so state size is bounded by local disk, not
  * heap — the production default for large stateful jobs.
  *
  * The provider is read per-query at START from the session conf, so call
  * [[useRocksDB]] before `.writeStream...start()`. Restarting an existing
  * query from a checkpoint written by a different provider is not
  * supported by Spark — pick the backend before first launch.
  */
object StateBackend {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Route all subsequently-started streaming queries' state to RocksDB.
    * Changelog checkpointing ships per-batch deltas instead of full
    * SST-file uploads — the setting that matters once state is large. */
  def useRocksDB(spark: SparkSession): Unit = {
    spark.conf.set(ProviderKey, RocksDBProvider)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }

  /** Revert to the default on-heap provider (new queries only). */
  def useDefault(spark: SparkSession): Unit = {
    spark.conf.unset(ProviderKey)
    spark.conf.unset(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
  }
}
