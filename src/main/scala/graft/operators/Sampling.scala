package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for corpus curation.
  *
  * Hash-based sampling is the scale tool: membership depends only on the
  * row's key (not partitioning, not a RNG stream), so re-runs, retries,
  * and different cluster layouts all select the same rows — and samples
  * compose (a 1% sample is a subset of a 10% sample with the same seed).
  */
object Sampling {

  /** Keep rows whose key hashes into the lowest `fraction` of hash space
    * (seeded, deterministic, partition-independent). */
  def hashSample(df: DataFrame, key: Column, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val bound = (fraction * (1L << 32).toDouble).toLong
    df.filter(pmod(xxhash64(lit(seed), key), lit(1L << 32)) < bound)
  }

  /** Per-stratum hash sampling: `fractions` maps stratum value → keep
    * fraction (strata absent from the map are dropped). */
  def stratifiedHashSample(
      df: DataFrame,
      stratum: Column,
      key: Column,
      fractions: Map[String, Double],
      seed: Long = 42L
  ): DataFrame = {
    val bound = fractions.foldLeft(lit(-1L)) { case (acc, (value, frac)) =>
      when(stratum === value, lit((frac * (1L << 32).toDouble).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(lit(seed), key), lit(1L << 32)) < bound)
  }
}
