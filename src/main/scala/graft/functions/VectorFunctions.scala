package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.Random

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Dot/norm/cosine are sequential left-folds in double precision —
  * the same operation order an engine-side `list_*` fold uses, so results
  * are reproducible for the correctness oracle. No UDFs. The hot kernels
  * (cosine, LSH bucket) are fused native expressions
  * ([[graft.functions.expressions.VectorKernels]]) — one pass, zero
  * intermediate arrays — bit-identical to the composed `zip_with` +
  * `aggregate` folds kept here as the spec baseline
  * (VectorExpressionsSpec).
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  private def d(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product in double precision. Fused single-pass
    * native expression (the composed fold is interpreted per element and
    * allocates the zipped array — at 16 centroid dots per row it was the
    * whole cost of IVF assignment); [[dotComposed]] is the specced
    * bit-identical baseline. */
  def dot(a: Column, b: Column): Column =
    toCol(graft.functions.expressions.DotProduct(toExpr(a), toExpr(b)))

  /** Composed-Column dot — the spec baseline for the native kernel. */
  private[graft] def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. Fused
    * single-pass native expression. */
  def cosine(a: Column, b: Column): Column =
    toCol(graft.functions.expressions.CosineSimilarity(toExpr(a), toExpr(b)))

  /** The composed-Column cosine (three folds) — the provably-equivalent
    * baseline the native kernel is specced against. */
  private[graft] def cosineComposed(a: Column, b: Column): Column = {
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
    * an 8-byte key instead of an O(n²) cross join. Fused native expression
    * (plane matrix shipped as a codegen constant). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    toCol(graft.functions.expressions.HyperplaneBucket(toExpr(v), planes))

  /** Bounded per-group top-k aggregate: `array<struct<score, id>>` sorted
    * by (score desc nulls-last, id asc), at most k entries. The
    * partial-combine replacement for a
    * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k`
    * window: map tasks combine each group down to k entries before the
    * exchange; no global Sort/Window ever materializes. */
  def boundedTopK(score: Column, id: Column, k: Int): Column =
    toCol(graft.functions.expressions.BoundedTopK(toExpr(score), toExpr(id), k)
      .toAggregateExpression())

  /** Ids of the `k` nearest centroids under cosine order (score desc,
    * centroid id asc on ties), as `array<int>` best-first. The centroid
    * matrix rides the expression as a codegen reference object
    * ([[graft.functions.expressions.NearestCentroids]]), so the plan is
    * O(1) in centroid count and assignment is shuffle-free — the IVF
    * argmax (`k = 1`) and probe (`k = nprobe`) kernel. */
  def nearestCentroids(v: Column, centroids: Seq[(Int, Seq[Double])], k: Int): Column =
    toCol(graft.functions.expressions.NearestCentroids(toExpr(v), centroids, k))

  /** PQ codes (array<int>, one argmin-L2 codeword index per subspace) —
    * the 16–64× embedding-storage cut; codebooks ride the expression as a
    * codegen reference object ([[graft.functions.expressions.PqEncode]]).
    * `books` is m × ksub × dsub. */
  def pqEncode(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    toCol(graft.functions.expressions.PqEncode(toExpr(v), books))

  /** Per-query ADC lookup table (flat array<double> of m·ksub subspace
    * dots) — computed once per query row, below the candidate join. */
  def pqLut(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    toCol(graft.functions.expressions.PqLut(toExpr(v), books))

  /** ADC score of (query LUT, candidate codes): rank-equivalent to
    * cosine(query, PQ-reconstruction) — m table lookups per pair. */
  def pqAdcScore(lut: Column, codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    toCol(graft.functions.expressions.PqAdcScore(toExpr(lut), toExpr(codes), books))

  /** Residual-ADC score (IVFADC): codes quantize x − centroid[cluster];
    * score is rank-equivalent to cosine(query, centroid + PQ
    * reconstruction). `qdotc` is ⟨query, centroid[cluster]⟩, computed
    * once per (query, probed-centroid) pair; the per-candidate cost
    * stays m lookups against precomputed cross tables. */
  def pqAdcResidualScore(
      lut: Column, codes: Column, cluster: Column, qdotc: Column,
      books: Seq[Seq[Seq[Double]]],
      centroids: Seq[(Int, Seq[Double])]): Column =
    toCol(graft.functions.expressions.PqAdcResidualScore(
      toExpr(lut), toExpr(codes), toExpr(cluster), toExpr(qdotc),
      books, centroids))

  /** Composed-Column LSH bucket — the spec baseline for the native kernel. */
  private[graft] def lshBucketComposed(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(d(v), array(p.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
