package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data endgame operators: sequence packing and weighted source
  * mixing — what a production pipeline runs AFTER curation
  * (`pipeline_curate`) to turn a cleaned corpus into training shards.
  */
object Packing {

  /** Greedy first-fit-in-order sequence packing: assign each item (a
    * document or chunk with an integer token count) to a fixed-budget
    * training row, never splitting an item and never exceeding `budget`
    * per bin.
    *
    * Scale shape: packing is sequential by nature (each bin's fill
    * depends on every earlier decision), so the distributed form packs
    * PER SHARD — exactly how real pipelines shard training files. Items
    * hash deterministically into `numShards` shards; within a shard they
    * are ordered by id and folded once, left to right: an item that
    * would overflow the open bin closes it and opens the next. The
    * parallelism is across shards; each shard's fold is a STREAMING pass
    * over its sorted iterator (`flatMapSortedGroups` — the
    * KeyValueGroupedDataset shape for genuinely sequential per-group
    * state) holding one (fill, bin) pair, so a 10⁶-item shard costs
    * O(items), never materializing the shard in memory (the first cut
    * accumulated the emitted list inside a Catalyst `aggregate` fold,
    * whose per-item `concat` copied the accumulator — O(items²) element
    * copies per shard). Only ids and token counts move, never text.
    * Size `numShards` so corpus/numShards matches the intended training
    * file size.
    *
    * Items with `tok > budget` can never fit any bin: they quarantine to
    * bin −1 (loud in the output, droppable downstream) and do not
    * disturb the running fill. A NULL token count quarantines the same
    * way — an explicit branch, because letting it fall through
    * when/otherwise chains gives engine-dependent bins. Deterministic: shard assignment depends
    * only on the id (`shardExpr` defaults to
    * `pmod(xxhash64(id), numShards)`; pass a modulo expression for a
    * SQL-twin oracle), and in-shard order is id order.
    *
    * Output: (idCol, shard int, bin bigint, n_tokens bigint) — bin
    * numbering is per shard, starting at 0. */
  def packSequences(
      items: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numShards: Int,
      shardExpr: Option[Column] = None
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    val sh = shardExpr.getOrElse(pmod(xxhash64(col(idCol)), lit(numShards)))
    // a caller-supplied shardExpr can evaluate NULL (e.g. pmod over a null
    // id); unguarded it would NPE inside groupByKey with no hint which row
    // is at fault. Fail loudly, naming the id. The default expr is
    // non-nullable, so Catalyst folds this branch away — zero hot-path
    // cost on the standard path.
    val shInt = sh.cast("int")
    val shChecked = when(shInt.isNull,
      raise_error(concat(
        lit(s"packSequences: shardExpr evaluated to NULL for $idCol="),
        coalesce(col(idCol).cast("string"), lit("NULL")),
        lit(" — coalesce the expression or filter null keys upstream")))
        .cast("int"))
      .otherwise(shInt)
    val prepared = items
      .select(col(idCol).as("id"), col(tokenCol).cast("long").as("tok"),
        shChecked.as("shard"))
    val idField = prepared.schema("id")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol, idField.dataType,
        idField.nullable),
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("bin",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = true)))
    prepared
      .groupByKey(r => r.getInt(2))
      .flatMapSortedGroups(col("id"), col("tok")) {
        (shard: Int, rows: Iterator[org.apache.spark.sql.Row]) =>
          var fill = 0L
          var cbin = 0L
          rows.map { r =>
            val tokNull = r.isNullAt(1)
            val tok = if (tokNull) 0L else r.getLong(1)
            // a NULL token count quarantines like an oversize item —
            // explicit, so the SQL oracle's CASE order agrees
            val bin =
              if (tokNull || tok > budget) -1L
              else if (fill + tok <= budget) { fill += tok; cbin }
              else { cbin += 1; fill = tok; cbin }
            org.apache.spark.sql.Row(r.get(0), shard, bin,
              if (tokNull) null else java.lang.Long.valueOf(tok))
          }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** Per-shard packing report over a [[packSequences]] result — the
    * fill-efficiency assert a training-shard build needs (a silently
    * half-empty shard wastes training compute; a quarantine-heavy shard
    * signals a tokenizer or budget misconfiguration). One aggregation
    * over the already-computed packing, no re-fold: per shard the bin
    * count, packed/quarantined item and token totals, and `utilization`
    * = packed tokens / (bins × budget). Quarantined items (bin −1:
    * oversize or null token count) are excluded from bins and
    * utilization and reported separately. */
  def packStats(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val ok = col("bin") >= 0
    packed.groupBy("shard").agg(
      (max(when(ok, col("bin"))) + 1).as("n_bins"),
      count(when(ok, lit(1))).as("n_packed"),
      count(when(!ok, lit(1))).as("n_quarantined"),
      coalesce(sum(when(ok, col("n_tokens"))), lit(0L)).as("packed_tokens"),
      coalesce(sum(when(!ok, col("n_tokens"))), lit(0L)).as("oversize_tokens"))
      .withColumn("n_bins", coalesce(col("n_bins"), lit(0L)))
      .withColumn("utilization",
        when(col("n_bins") > 0,
          round(col("packed_tokens") / (col("n_bins") * lit(budget)), 6))
          .otherwise(lit(0.0)))
  }
}

/** Weighted source mixing: deterministically interleave N tagged corpora
  * at target ratios into output shards. */
object Mixing {

  /** One input corpus: a tag (lands in the output `source` column), the
    * frame, and an INTEGER weight — target ratios are weight parts
    * (5:3:2), kept integral so the per-source keep bounds are exact
    * integer arithmetic, replicable bit-for-bit by a SQL oracle (double
    * ratios would make the bound engine-dependent in the last ulp).
    *
    * `epochs` (r14) is the UP-sampling lever real token-budget mixes
    * need: a high-value source may repeat up to `epochs` times
    * (Wikipedia ×3) instead of every other source down-sampling to one
    * pass of the bottleneck. The source behaves exactly like a corpus of
    * `n · epochs` rows in the bound arithmetic; physically each copy
    * `c ∈ [0, epochs)` is emitted with an `epoch` column and its own
    * deterministic per-copy sample key (tag, epoch, id) — copy `c` of a
    * row is the same row on every cluster layout and re-run. */
  final case class SourceSpec(tag: String, df: DataFrame, weight: Int,
      epochs: Int = 1)

  /** Deterministic weighted mix: sample each source down so the output
    * composition matches `weights` as closely as the bottleneck source
    * allows, tag every surviving row with its source, and assign it an
    * output shard.
    *
    * The bottleneck source b maximizes use of the data: it is the source
    * with the smallest n_j/w_j (found by comparing n_j·(W/w_j) in exact
    * integer arithmetic, W = Π w_j — no rational division), keeps ALL its
    * rows, and every other source keeps
    * `floor(granularity · n_b · w_i / (w_b · n_i))` of `granularity`
    * hash-space slices — membership depends only on the row's id, so
    * re-runs and different cluster layouts select the same rows (the
    * [[Sampling]] property), and the count probe (one count per source,
    * the only jobs this operator runs before the main plan) is the
    * integer input both engines agree on.
    *
    * `sampleExpr`/`shardExpr` default to seeded xxhash64 of
    * (tag, epoch, id); pass modulo expressions of (tag, epoch, id) for a
    * SQL-twin oracle. Output: (source string, idCol, epoch int,
    * shard int). */
  def mixSources(
      sources: Seq[SourceSpec],
      idCol: String,
      numShards: Int,
      granularity: Long = 1L << 20,
      seed: Long = 42L,
      sampleExpr: (String, Int, Column) => Option[Column] = (_, _, _) => None,
      shardExpr: (String, Int, Column) => Option[Column] = (_, _, _) => None
  ): DataFrame =
    mixSourcesWithStats(sources, idCol, numShards, granularity, seed,
      sampleExpr, shardExpr)._1

  /** Per-source composition report of a [[mixSourcesWithStats]] run —
    * what a 100 TB pipeline asserts on instead of trusting the mix:
    * input count, the integer keep bound out of `granularity`
    * hash-space slices, the expected surviving rows under a uniform
    * sample hash (exact `n` for the bottleneck — its bound is the whole
    * space), and target vs expected output share. Derived entirely from
    * the count probe the mix already runs — no extra jobs. */
  final case class MixStats(
      tag: String,
      n: Long,
      weight: Int,
      epochs: Int,
      bottleneck: Boolean,
      bound: Long,
      granularity: Long,
      keptEstimate: Long,
      targetShare: Double,
      achievedShareEstimate: Double)

  /** [[mixSources]] plus the per-source [[MixStats]] the run derived its
    * keep bounds from — the convergence-report analog of
    * `Dedup.dropNearDuplicatesWithStats`. */
  def mixSourcesWithStats(
      sources: Seq[SourceSpec],
      idCol: String,
      numShards: Int,
      granularity: Long = 1L << 20,
      seed: Long = 42L,
      sampleExpr: (String, Int, Column) => Option[Column] = (_, _, _) => None,
      shardExpr: (String, Int, Column) => Option[Column] = (_, _, _) => None
  ): (DataFrame, Seq[MixStats]) = {
    require(sources.nonEmpty, "at least one source")
    require(sources.map(_.tag).distinct.size == sources.size,
      "source tags must be distinct (counts and bounds are keyed by tag)")
    require(sources.forall(_.weight > 0), "weights must be positive")
    require(sources.forall(_.epochs >= 1), "epochs must be >= 1")
    require(sources.forall(_.epochs <= 1000),
      "epochs > 1000 is almost certainly a misconfiguration (each epoch " +
        "is a full physical pass over the source)")
    require(numShards > 0 && granularity > 0, "positive shards/granularity")

    val counts = sources.map(s => s.tag -> s.df.count()).toMap
    // an empty source would become the bottleneck (n/w = 0) and zero
    // every keep bound — a pipeline whose one sub-corpus came up empty
    // must fail LOUDLY, not ship zero training data
    val empty = counts.collect { case (tag, 0L) => tag }
    require(empty.isEmpty,
      s"mixSources: empty source(s) ${empty.mkString(", ")} make the " +
        "target ratios unsatisfiable — drop them or fix the upstream feed")
    val wProduct = sources.map(s => BigInt(s.weight)).product
    // EFFECTIVE counts n_j · e_j enter all ratio arithmetic: an epochs-3
    // source is exactly a corpus three times its size to the bound math
    def eff(s: SourceSpec): BigInt = BigInt(counts(s.tag)) * s.epochs
    // bottleneck: smallest n'_j/w_j via exact integer keys n'_j * (W/w_j)
    val bottleneck = sources.minBy { s => (eff(s) * (wProduct / s.weight), s.tag) }
    val nB = eff(bottleneck)
    val wB = BigInt(bottleneck.weight)

    val bounds = sources.map { s =>
      val bound =
        if (s.tag == bottleneck.tag) granularity
        else (BigInt(granularity) * nB * s.weight / (wB * eff(s)))
          .min(BigInt(granularity)).toLong
      s.tag -> bound
    }.toMap
    val tagged = sources.flatMap { s =>
      (0 until s.epochs).map { e =>
        val id = col(idCol)
        // per-COPY sample key: copy e of a row survives or not purely as
        // a function of (tag, e, id) — layout- and re-run-independent
        val sample = sampleExpr(s.tag, e, id).getOrElse(
          pmod(xxhash64(lit(seed), lit(s.tag), lit(e), id), lit(granularity)))
        val shard = shardExpr(s.tag, e, id).getOrElse(
          pmod(xxhash64(lit(seed + 1), lit(s.tag), lit(e), id), lit(numShards)))
        s.df
          .filter(sample < lit(bounds(s.tag)))
          .select(lit(s.tag).as("source"), id.as(idCol),
            lit(e).as("epoch"), shard.cast("int").as("shard"))
      }
    }

    val wSum = sources.map(_.weight.toDouble).sum
    val keptEst = sources.map { s =>
      // bottleneck: bound == granularity ⇒ exactly n·e; others: expected
      // surviving rows of a uniform hash over `granularity` slices per copy
      s.tag -> (eff(s) * bounds(s.tag) / granularity).toLong
    }.toMap
    val keptSum = keptEst.values.map(_.toDouble).sum.max(1.0)
    val stats = sources.map { s =>
      MixStats(s.tag, counts(s.tag), s.weight, s.epochs,
        bottleneck = s.tag == bottleneck.tag,
        bound = bounds(s.tag), granularity = granularity,
        keptEstimate = keptEst(s.tag),
        targetShare = s.weight / wSum,
        achievedShareEstimate = keptEst(s.tag) / keptSum)
    }
    (tagged.reduce(_.unionByName(_)), stats)
  }
}
