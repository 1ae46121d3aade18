package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: the "what is in this table" pass that precedes any
  * export or training run. One job computes every column's stats
  * simultaneously (a single aggregation over the scan — not one pass per
  * column).
  */
object Profile {

  /** Per-column row/null/distinct counts as rows of
    * (column, n_rows, n_nulls, n_distinct). Exact counts → oracle-safe. */
  def nullsAndDistinct(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"))
    }
    wide.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }

  /** Approximate per-group quantiles verified through the sketch's own
    * guarantee — the Misra–Gries-certificate pattern applied to
    * Greenwald–Khanna (Spark's `approx_percentile`): the summary is
    * MERGEABLE (map-side partials, one fixed-width buffer per group —
    * the only per-group quantile that survives 100 TB groups; exact
    * `percentile` sorts every group's values through the aggregation),
    * but the returned element is processing-order-dependent, so no exact
    * oracle over the estimates exists. What IS deterministic is the
    * guarantee: the estimate's rank sits within ε·n of the target rank
    * (ε = 1/accuracy). This emits a per-(group, quantile) certificate —
    * exact `n`, the exact integer ALLOWED-RANK WINDOW `[r_lo, r_hi]`
    * (pure arithmetic of (n, φ, ε) — r17, engine-independent: the DuckDB
    * oracle recomputes both bounds relationally from its own exact `n`,
    * so a window-arithmetic bug here hash-mismatches instead of silently
    * certifying), plus `n_violations`, the count of quantiles whose
    * realized rank interval `[count(<v)+1, count(≤v)]` misses the
    * window — which the guarantee forces to ZERO. The realized-rank half
    * necessarily stays Spark-side: the oracle never sees Spark's
    * estimates (it runs over the input tables only) and GK estimates are
    * not cross-engine-deterministic, so no oracle can recount their
    * ranks; its detection power is pinned by the planted-wrong-estimate
    * spec against the separable [[certifyQuantiles]].
    *
    * All arithmetic is integer in permille×accuracy space (cross-
    * multiplications plus two exact integer ceil/floor divisions for the
    * bounds — shifted non-negative so truncating and flooring division
    * agree in every engine), with ±1 rank of target-rounding slack —
    * two orders below ε·n at any realistic n, present only so the
    * certificate does not encode one engine's ceil-vs-floor rank
    * convention.
    *
    * Plan shape: one pass builds every group's summary (map-side
    * partials); the verification pass joins the groups×quantiles
    * estimate rows (a broadcast of a few dozen rows) back against the
    * data and collapses via partial aggregation — two scans total,
    * no data-sized shuffle. */
  def quantileCertificate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      permilles: Seq[Int],
      accuracy: Int): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p > 0 && p < 1000),
      s"permilles must be in (0, 1000), got $permilles")
    require(permilles.distinct.size == permilles.size,
      s"permilles must be distinct, got $permilles")
    require(accuracy > 1, s"accuracy must be > 1, got $accuracy")
    val g = col(groupCol)
    val v = col(valueCol)
    val data = df.select(g.as("__g"), v.as("__v")).filter(col("__v").isNotNull)
    val qArr = array(permilles.map(p => lit(p / 1000.0)): _*)
    val est = data.groupBy("__g").agg(
      percentile_approx(col("__v"), qArr, lit(accuracy)).as("__est"),
      count(lit(1)).as("n"))
      .select(col("__g"), col("n"),
        posexplode(col("__est")).as(Seq("__i", "__q")))
      .select(col("__g"), col("n"),
        element_at(
          array(permilles.map(p => lit(p.toLong)): _*), col("__i") + 1)
          .as("q_permille"),
        col("__q"))
    certifyQuantiles(data, est, accuracy).withColumnRenamed("__g", groupCol)
  }

  /** The verification half of [[quantileCertificate]], separable so its
    * detection power is testable against a planted-wrong estimate.
    * `data` is (__g, __v); `est` is (__g, n, q_permille, __q). */
  private[operators] def certifyQuantiles(
      data: DataFrame, est: DataFrame, accuracy: Int): DataFrame = {
    val ranks = data.join(broadcast(est), "__g")
      .groupBy("__g", "q_permille", "n")
      .agg(
        sum(when(col("__v") < col("__q"), 1L).otherwise(0L)).as("__r_lt"),
        sum(when(col("__v") <= col("__q"), 1L).otherwise(0L)).as("__r_le"))
    val acc = accuracy.toLong
    // realized rank interval of the estimate is [r_lt + 1, r_le]; with
    // ±1 rank of convention slack it misses the φ·n ± ε·n window iff
    //   low:  (r_le + 1)·1000·acc < q·n·acc − n·1000
    //   high: (r_lt + 1 − 1)·1000·acc > q·n·acc + n·1000
    // Factored (r17) through the EXPLICIT integer rank window so the
    // bounds themselves are emitted and cross-verified by the oracle:
    // with S = 1000·acc, T = q·n·acc, E = n·1000,
    //   r_lo = ceil((T − E)/S) − 1   (a < t ⟺ a ≤ ceil(t) − 1)
    //   r_hi = floor((T + E)/S)      (a > t ⟺ a > floor(t))
    //   violation ⟺ r_le < r_lo OR r_lt > r_hi — algebraically
    //   identical to the inequalities above (ProfileQuantileSpec pins
    //   the same edge ranks). The ceil runs on T − E + n·S ≥ 0 (shifted
    //   by n, subtracted back) so truncating (Spark `div`) and flooring
    //   (DuckDB `//`) integer division agree.
    // Cross-multiplications run in DecimalType(38,0): in Long they can
    // silently wrap (non-ANSI) at extreme n×accuracy (n ~1e12 with
    // accuracy ~1e5 puts q·n·acc past 2⁶³) and corrupt the certificate
    // at exactly the 100 TB scale it advertises. Operands are ≤3 + ~13 +
    // ~6 digits — every product fits 38 digits with huge headroom; the
    // OUTPUT stays Long, so no Decimal reaches the oracle hash.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    ranks
      .withColumn("__t", col("q_permille").cast(dec) * col("n").cast(dec) *
        lit(acc).cast(dec))
      .withColumn("__e", col("n").cast(dec) * lit(1000L).cast(dec))
      .withColumn("__s", lit(1000L * acc).cast(dec))
      .withColumn("r_lo", expr(
        "CAST((__t - __e + n * __s + __s - 1) div __s AS BIGINT) - n - 1"))
      .withColumn("r_hi", expr("CAST((__t + __e) div __s AS BIGINT)"))
      .select(col("__g"), col("q_permille"), col("n"),
        col("r_lo"), col("r_hi"),
        when(col("__r_le") < col("r_lo") || col("__r_lt") > col("r_hi"), 1L)
          .otherwise(0L).as("n_violations"))
  }

  /** Scale-path profiling: identical output shape to [[nullsAndDistinct]]
    * but with `approx_count_distinct` (HyperLogLog++) instead of exact
    * `countDistinct`.
    *
    * Exact multi-column countDistinct compiles to an `Expand` node that
    * multiplies every scanned row ×(n_cols+1) before aggregation — on a
    * 100 TB, 300-column table that is a 301× row blowup. The HLL sketch
    * variant is one pass with no Expand (each sketch is a fixed-width
    * buffer merged map-side), the only profiling default that survives
    * wide tables at scale; `rsd` trades sketch size for accuracy. */
  def nullsAndDistinctApprox(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"))
    }
    wide.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }

  /** One-pass numeric summary at scale — min/max/mean + approximate
    * quantiles (KLL-style sketch via `percentile_approx`) for every listed
    * column simultaneously. The exact `percentile` aggregate buffers every
    * value per group, which a 100 TB column cannot do; the sketch is
    * fixed-size and merges map-side. Output: one row per column
    * (column, min, max, mean, p50, p90, p99). */
  def numericSummaryApprox(
      df: DataFrame,
      cols: Seq[String],
      accuracy: Int = 10000
  ): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        avg(col(c)).as(s"__avg_$c"),
        percentile_approx(col(c),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy))
          .as(s"__q_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"),
        col(s"__avg_$c").as("mean"),
        element_at(col(s"__q_$c"), 1).cast("double").as("p50"),
        element_at(col(s"__q_$c"), 2).cast("double").as("p90"),
        element_at(col(s"__q_$c"), 3).cast("double").as("p99"))
    }
    wide.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.min"), col("p.max"), col("p.mean"),
        col("p.p50"), col("p.p90"), col("p.p99"))
  }
}
