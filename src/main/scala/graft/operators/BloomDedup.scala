package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.{BloomShardContains, BloomShards}

/** Persisted-sketch incremental dedup: the 100 TB daily-ingest gate.
  *
  * [[Dedup.dropKnown]] already dedupes a new batch against the historical
  * corpus without shuffling corpus text — but it still SCANS the corpus
  * every run (the semi-join filter reads every row's hash). At 100 TB the
  * daily scan is the whole cost. This operator maintains a persisted,
  * sharded Bloom sketch of the corpus's content hashes so the daily run
  * touches the corpus only for Bloom-POSITIVE batch rows:
  *
  *   - `!mightContain(hash)` rows are PROVABLY new (Bloom has no false
  *     negatives over inserted values) — kept with zero corpus I/O;
  *   - `mightContain` rows are candidates (true dups + fpp noise) and go
  *     through the exact `(hash, content)` confirm of [[Dedup.dropKnown]],
  *     so the final output is EXACT — identical to an unrestricted
  *     content anti-join, which is what the DuckDB oracle replays.
  *
  * When the batch has no candidates at all (the common all-new crawl
  * day), the corpus is not opened: one batch-scale emptiness probe
  * replaces the 100 TB scan.
  *
  * Scale layout: the sketch shards by `pmod(hash, numShards)` — each
  * shard stays under the session's runtime-filter caps (4M items / 64 MB
  * default) while the union covers an arbitrarily large corpus; shards
  * build in one distributed pass (per-shard `BloomFilterAggregate`, the
  * machinery behind Spark's own runtime join filters) and merge
  * per-shard on append. Driver memory is bounded by
  * numShards × shard bytes — the codebook-collect class of bound, sized
  * by the caller through `numShards`.
  *
  * Operational contract (same as any external index): the sketch must
  * cover EVERY corpus row's content hash — append to it whenever the
  * corpus grows ([[appendToSketch]]). A corpus row missing from the
  * sketch can let its duplicate through; staleness in the other
  * direction (sketch rows whose corpus doc was deleted) only adds
  * candidates, never errors. Sizing is by PLANNED capacity: appends
  * reuse the frozen (items, bits) geometry, so inserting far past
  * `expectedItems` degrades realized fpp (more candidates, never wrong
  * output).
  *
  * Reference behavior anchor: db2pq refreshes WRDS tables by comparing
  * last-modified state before re-downloading (`sync/Modified`-class
  * "skip known content" gating, _public_api.py:61-108); this is that
  * idea applied at document granularity and 100 TB scale.
  */
object BloomDedup {

  val ShardCol = "shard"
  val SketchCol = "sketch"
  val ItemsCol = "items_per_shard"
  val BitsCol = "num_bits"

  private val sketchSchema = StructType(Seq(
    StructField(ShardCol, IntegerType, nullable = false),
    StructField(SketchCol, BinaryType, nullable = false),
    StructField(ItemsCol, LongType, nullable = false),
    StructField(BitsCol, LongType, nullable = false)))

  private def bloomAgg(itemsPerShard: Long, bitsPerShard: Long) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(col("__h")),
      Literal(itemsPerShard), Literal(bitsPerShard))
      .toAggregateExpression()).as(SketchCol)
  }

  /** Per-shard geometry for `expectedItems` total at `fpp`, checked
    * against the session caps. FAILS (not warns) past the caps:
    * `BloomFilterAggregate` clamps its arguments silently, which would
    * freeze a degraded geometry into the persisted sketch — the fix is
    * more shards, so say so. */
  private def shardGeometry(
      df: DataFrame, expectedItems: Long, numShards: Int, fpp: Double): (Long, Long) = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(expectedItems >= 1, s"expectedItems must be >= 1, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val items = math.max((expectedItems + numShards - 1) / numShards, 1L)
    val bits = math.max(
      (-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong, 64L)
    def conf(k: String, dflt: Long) =
      df.sparkSession.conf.getOption(k).map(_.toLong).getOrElse(dflt)
    val maxItems = conf(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val maxBits = conf(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
    require(items <= maxItems && bits <= maxBits,
      s"bloom sketch shard needs $items items / $bits bits but the session " +
        s"caps BloomFilterAggregate at $maxItems / $maxBits (past them it " +
        "CLAMPS silently and the persisted geometry degrades) — raise " +
        s"numShards (currently $numShards) so each shard fits, or raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits")
    (items, bits)
  }

  /** One distributed pass building every shard, then driver-side
    * normalization to EXACTLY numShards rows (an aggregate emits no row
    * for a shard no hash landed in; a missing shard must probe as an
    * EMPTY filter, not a lookup error). `BloomFilter.create(items, bits)`
    * is the aggregate's own buffer factory, so filled holes and appended
    * batch sketches stay merge-compatible by construction. */
  private def shardRows(
      hashes: DataFrame, numShards: Int, items: Long, bits: Long): Array[Row] = {
    val built = hashes
      .groupBy(pmod(col("__h"), lit(numShards)).cast("int").as(ShardCol))
      .agg(bloomAgg(items, bits))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    def emptyShard: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      BloomFilter.create(items, bits).writeTo(out)
      out.toByteArray
    }
    Array.tabulate(numShards) { s =>
      Row(s, built.getOrElse(s, emptyShard), items, bits)
    }
  }

  /** Build the sharded sketch over `corpus`'s content hashes. Returns a
    * numShards-row local DataFrame `(shard, sketch, items_per_shard,
    * num_bits)` — persist it next to the corpus (a parquet write) and
    * [[appendToSketch]] on every ingest. `expectedItems` is the PLANNED
    * corpus capacity (not the current count): geometry freezes here. */
  def buildSketch(
      corpus: DataFrame,
      textCol: String,
      expectedItems: Long,
      numShards: Int = 1,
      fpp: Double = 0.03): DataFrame = {
    val (items, bits) = shardGeometry(corpus, expectedItems, numShards, fpp)
    val hashes = corpus.select(xxhash64(col(textCol)).as("__h"))
      .filter(col("__h").isNotNull)
    corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(shardRows(hashes, numShards, items, bits): _*),
      sketchSchema)
  }

  /** Fold a new ingest's content hashes into an existing sketch under its
    * FROZEN geometry (same shard count, items, bits — the merge
    * precondition). Distributed build of the ingest's shard sketches,
    * driver-side per-shard `mergeInPlace` (numShards × shard bytes,
    * bounded). Returns the merged sketch in the same layout. */
  def appendToSketch(sketch: DataFrame, batch: DataFrame, textCol: String): DataFrame = {
    val existing = sketch.select(ShardCol, SketchCol, ItemsCol, BitsCol).collect()
    require(existing.nonEmpty, "appendToSketch: empty sketch table")
    val numShards = existing.length
    val items = existing.head.getLong(2)
    val bits = existing.head.getLong(3)
    require(existing.forall(r => r.getLong(2) == items && r.getLong(3) == bits),
      "appendToSketch: inconsistent per-shard geometry in sketch table")
    require(existing.map(_.getInt(0)).sorted.sameElements(0 until numShards),
      s"appendToSketch: sketch table must hold shards 0..${numShards - 1} exactly")
    val hashes = batch.select(xxhash64(col(textCol)).as("__h"))
      .filter(col("__h").isNotNull)
    val fresh = shardRows(hashes, numShards, items, bits)
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = existing.map { r =>
      val s = r.getInt(0)
      val base = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      base.mergeInPlace(BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(fresh(s))))
      val out = new java.io.ByteArrayOutputStream()
      base.writeTo(out)
      Row(s, out.toByteArray, items, bits)
    }
    sketch.sparkSession.createDataFrame(
      java.util.Arrays.asList(merged: _*), sketchSchema)
  }

  /** Collect the sketch table (numShards rows — bounded) into the probe
    * carrier the expression rides. */
  def loadShards(sketch: DataFrame): BloomShards = {
    val rows = sketch.select(ShardCol, SketchCol).collect().sortBy(_.getInt(0))
    require(rows.map(_.getInt(0)).sameElements(rows.indices),
      s"loadShards: sketch table must hold shards 0..${rows.length - 1} exactly")
    BloomShards.fromBytes(rows.map(_.getAs[Array[Byte]](1)).toSeq)
  }

  /** `true` iff the sketch might contain `xxhash64(textCol)`; null-text
    * rows probe as `false` (a null can never have been inserted). */
  def mightContainText(shards: BloomShards, textCol: String) =
    coalesce(
      ColumnBridge.column(BloomShardContains(
        ColumnBridge.expression(xxhash64(col(textCol))), shards)),
      lit(false))

  /** Drop rows of `batch` whose content already exists in `corpus`, using
    * the persisted sketch to confine corpus I/O to Bloom-positive
    * candidates. Output is EXACT (≡ [[Dedup.dropKnown]] ≡ a content
    * anti-join): the Bloom split only routes rows — provably-new ones
    * skip the corpus, candidates get the exact (hash, content) confirm.
    *
    * `skipCorpusWhenClean` spends one batch-scale job probing for
    * candidates; when there are none (the all-new ingest) the returned
    * plan contains NO corpus scan at all. Set it false to keep the
    * operator fully lazy. */
  def dropKnownBloom(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String,
      sketch: DataFrame,
      skipCorpusWhenClean: Boolean = true): DataFrame = {
    val shards = loadShards(sketch)
    val might = mightContainText(shards, textCol)
    val definiteNew = batch.filter(!might)
    val candidates = batch.filter(might)
    if (skipCorpusWhenClean && candidates.isEmpty) definiteNew
    else definiteNew.unionByName(Dedup.dropKnown(candidates, corpus, textCol))
  }
}
