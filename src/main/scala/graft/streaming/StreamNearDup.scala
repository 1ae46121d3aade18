package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming MinHash-LSH near-duplicate pairs — the ingest-time twin of
  * [[graft.operators.Dedup.minhashPairs]], closing the last batch/stream
  * asymmetry in the dedup family (streaming previously had EXACT dedup
  * only, [[StreamDedup]]).
  *
  * Shape: per-doc signatures come from the same fused
  * `MinHashSignature` kernel as the batch operator (a stateless
  * projection — text never enters state), band hashes explode into
  * (window, band, bucket) groups, and each group is a
  * `flatMapGroupsWithState` bucket whose state is the member (id,
  * signature) list — fixed-width, BOUNDED by `maxBucket` (the
  * [[StreamTopK]] state-capping pattern) and expired by the event-time
  * watermark when its tumbling window closes. Emission happens solely on
  * EventTimeTimeout, so Append output is exactly-once per closed window.
  *
  * Equivalence to the batch operator on a closed window
  * (StreamNearDupSpec proves the multi-batch MemoryStream run):
  *  - a pair collides in band b iff its signatures agree on all of
  *    band b's slots, so each near-dup pair is seen by every band it
  *    collides in; the pair emits ONLY from its CANONICAL (lowest)
  *    colliding band — the stateless LSH dedup trick that replaces the
  *    batch operator's cross-bucket `groupBy(id_a, id_b)` merge (a
  *    second stateful stage here). Identical signatures collide in
  *    every band and emit from band 0 with est 1.0 — the batch
  *    equal-signature branch, uncapped there, bucket-capped here.
  *  - est_jaccard is the same equal-slot fraction both sides.
  *  - an over-`maxBucket` bucket emits NOTHING, mirroring the batch
  *    `size(xs) BETWEEN 2 AND maxBucket` crowding guard. The guards
  *    differ under the cap in kind (batch counts DISTINCT signatures
  *    after the collapse and star-expands degenerate equal groups;
  *    the stream counts raw members), so stream ≡ batch holds for
  *    buckets under BOTH caps — the operating regime; a crowded
  *    boilerplate key degrades to silence here and to capped stars
  *    there, both bounded.
  *  - CORNER CASE, wider than the cap note above: a pair is LOST on
  *    the stream side when its CANONICAL (lowest colliding) band's
  *    bucket died over `maxBucket` while a live higher-band bucket
  *    still holds both members — the live bucket refuses to emit
  *    (`canonicalBand != band`, it cannot know its lower sibling is
  *    dead) and the dead bucket emits nothing, whereas the batch twin
  *    still surfaces the pair through the uncrowded bucket. Emitting
  *    from the lowest LIVE band instead would need cross-bucket
  *    knowledge (a second stateful stage keyed by pair), which this
  *    operator deliberately avoids; accept the loss (it requires a
  *    boilerplate-crowded band, i.e. already-degraded keys) or raise
  *    `maxBucket`.
  *
  * The standard late-data caveat applies ([[StreamTopK]]): an event
  * arriving after its window's watermark close re-opens the bucket and a
  * supplemental emission (pairs among the late docs only) follows —
  * size `watermarkDelay` to real lateness, or collapse by
  * (window_start, id_a, id_b) downstream.
  */
object StreamNearDup {

  /** One timestamped document. */
  final case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Internal banded row (public: the Dataset encoder codegens field
    * access and cannot reach a private class's members). */
  final case class BandedDoc(
      doc_id: Long, ts: java.sql.Timestamp, sig: Seq[Long], band: Int, bh: Long)

  /** Band-bucket state: member ids + signatures (fixed-width — never
    * text), `dead` once the bucket exceeded `maxBucket`. */
  final case class BucketState(
      ids: Seq[Long], sigs: Seq[Seq[Long]], dead: Boolean)

  /** One emitted near-dup pair (id_a < id_b), per closed window. */
  final case class NearDupPair(
      window_start: Long, id_a: Long, id_b: Long, est_jaccard: Double)

  /** Streaming near-dup pairs per `windowSeconds` tumbling window. */
  def pairsPerWindow(
      docs: Dataset[DocEvent],
      windowSeconds: Long,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      watermarkDelay: String = "0 seconds",
      maxBucket: Int = 500
  ): Dataset[NearDupPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(maxBucket > 1, "maxBucket must allow at least one pair")
    val r = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val sigCol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.MinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("text")),
        shingleK, numHashes, 0)).as("sig")
    // NOTE: the length filter is declared after withWatermark, but
    // Catalyst pushes it below the watermark stats collector (it doesn't
    // reference the event-time column) — so a too-short document does
    // NOT advance the watermark. Watermark progress must come from rows
    // that pass the shingle filter, like any source-side filter.
    val banded = docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .filter(col("text").isNotNull && octet_length(col("text")) >= shingleK)
      .select(col("doc_id"), col("ts"), sigCol)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(graft.functions.MinHash.bandHashes(col("sig"), bands, r))
          .as(Seq("band", "bh")))
      .as[BandedDoc]

    banded
      .groupByKey(b => (math.floorDiv(
        math.floorDiv(b.ts.getTime, 1000L), windowSeconds) * windowSeconds,
        b.band, b.bh))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Int, Long), evs: Iterator[BandedDoc],
         state: org.apache.spark.sql.streaming.GroupState[BucketState]) =>
          val (ws, band, _) = key
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.dead) Iterator.empty
            else emitCanonical(ws, band, st, r, numHashes, threshold)
          } else {
            val cur = state.getOption.getOrElse(BucketState(Nil, Nil, dead = false))
            var ids = cur.ids.toVector
            var sigs = cur.sigs.toVector
            var dead = cur.dead
            evs.foreach { b =>
              if (!dead) {
                if (ids.length >= maxBucket) {
                  // crowding guard: mirror the batch BETWEEN(2, maxBucket)
                  // bucket drop AND bound the state — a poisoned bucket
                  // holds no members at all
                  dead = true; ids = Vector.empty; sigs = Vector.empty
                } else { ids :+= b.doc_id; sigs :+= b.sig }
              }
            }
            state.update(BucketState(ids, sigs, dead))
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              (ws + windowSeconds) * 1000))
            Iterator.empty
          }
      }
  }

  /** In-bucket pair expansion with canonical-band dedup: emit (a, b)
    * from THIS band only if no lower band also collides — each pair
    * then emits exactly once per window across all its buckets. Slot
    * comparison stands in for band-hash equality (they differ only on a
    * 2⁻⁶⁴ hash collision, below the sketch's own noise floor). */
  private def emitCanonical(
      ws: Long, band: Int, st: BucketState,
      r: Int, numHashes: Int, threshold: Double): Iterator[NearDupPair] = {
    val n = st.ids.length
    val out = Vector.newBuilder[NearDupPair]
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (st.ids(i) != st.ids(j)) {
          val sa = st.sigs(i)
          val sb = st.sigs(j)
          var eq = 0
          var s = 0
          while (s < numHashes) { if (sa(s) == sb(s)) eq += 1; s += 1 }
          val est = eq.toDouble / numHashes
          if (est >= threshold && canonicalBand(sa, sb, r) == band) {
            out += NearDupPair(ws,
              math.min(st.ids(i), st.ids(j)),
              math.max(st.ids(i), st.ids(j)), est)
          }
        }
        j += 1
      }
      i += 1
    }
    out.result().iterator
  }

  /** Lowest band index whose full slot range agrees; -1 when none. */
  private def canonicalBand(sa: Seq[Long], sb: Seq[Long], r: Int): Int = {
    val bands = sa.length / r
    var b = 0
    while (b < bands) {
      var s = b * r
      var ok = true
      while (ok && s < (b + 1) * r) { ok = sa(s) == sb(s); s += 1 }
      if (ok) return b
      b += 1
    }
    -1
  }

  /** Batch twin — per-tumbling-window [[Dedup.minhashPairs]] on a static
    * frame, the DuckDB-oracle hook and the spec's equivalence target.
    * Output: (window_start epoch, id_a, id_b, est_jaccard). The distinct
    * window list is collected (one column-pruned scan) to drive one
    * bounded `minhashPairs` plan per window: windows of a batch backfill
    * are calendar-bounded (hours/days), not corpus-bounded — a backfill
    * spanning very many windows should run them as separate jobs. */
  def pairsBatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      windowSeconds: Long,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 500,
      verified: Boolean = false
  ): DataFrame = {
    val ts = unix_timestamp(col(tsCol).cast("timestamp"))
    val withWs = docs.withColumn("__ws", ts - pmod(ts, lit(windowSeconds)))
    val windows = withWs.select("__ws").distinct()
      .collect().map(_.getLong(0)).sorted // bounded: calendar windows
    windows.map { w =>
      val win = withWs.filter(col("__ws") === w)
      // verified = the production threshold-1.0 pattern: templated
      // near-identical docs can collide at FULL signature; the fused
      // digest join prunes them to byte-exact pairs (the dedup_minhash
      // lesson). The streaming operator emits unverified candidates —
      // its exact verification is the same downstream digest join.
      val pairs =
        if (verified) Dedup.minhashPairsVerified(win, idCol, textCol,
          shingleK, numHashes, bands, threshold, maxBucket)
        else Dedup.minhashPairs(win, idCol, textCol,
          shingleK, numHashes, bands, threshold, maxBucket)
      pairs.select(lit(w).as("window_start"), col("id_a"), col("id_b"),
        col("est_jaccard"))
    }.reduceOption(_ unionByName _).getOrElse {
      // empty input frame → empty result in the output schema, not an
      // UnsupportedOperationException from reduce() on an empty list
      val spark = docs.sparkSession
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("window_start", LongType),
          StructField("id_a", LongType),
          StructField("id_b", LongType),
          StructField("est_jaccard", DoubleType))))
    }
  }
}
