package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.Random

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Dot/norm/cosine are sequential left-folds in double precision —
  * the same operation order an engine-side `list_*` fold uses, so results
  * are reproducible for the correctness oracle. No UDFs: `zip_with` +
  * `aggregate` stay inside codegen and vectorize over the parquet scan.
  */
object VectorFunctions {

  private def d(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === lit(0.0), lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Deterministic random hyperplanes (unit-free Gaussian components),
    * seeded — the LSH family for angular distance. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id (bigint) for a vector: bit j is the sign of
    * `v · plane_j`. Vectors within a small angle share buckets with high
    * probability; candidate generation is then a co-partitioned groupBy on
    * an 8-byte key instead of an O(n²) cross join. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(d(v), array(p.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
