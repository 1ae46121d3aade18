package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd refinement on an integer lattice — the full-corpus
  * stage of the two-stage k-means a 100 TB ANN index actually trains
  * with: `Similarity.ivfTrain`/`pqTrain` do bounded-sample driver Lloyd
  * (the FAISS pattern); this refines those centroids over EVERY vector
  * as Spark jobs, one assignment+update pass per iteration.
  *
  * Why a lattice: float Lloyd's centroid update is a partition-order-
  * dependent float sum — not reproducible, not oracle-able. Quantizing
  * to an integer lattice (scale a power of two, so `x·scale` is exact
  * in double) makes every sum EXACT and order-independent, the argmin
  * exact integer arithmetic, and the centroid update a fixed rounding
  * (`floor((2s + n) / (2n))` — nearest lattice point, halves down), so
  * the whole refinement is bit-deterministic across partitionings AND
  * relationally replayable in the DuckDB oracle. Quantized assignment
  * differs from float assignment by at most the lattice spacing — the
  * standard coarse-quantizer trade (cf. the int8 path of
  * `embed_quantize`), irrelevant for centroid TRAINING where centroids
  * are summaries, not answers.
  *
  * Plan shape per iteration: one scan; assignment is a compiled argmin
  * kernel with the centroid matrix as a codegen reference object
  * ([[graft.functions.expressions.NearestLatticeCentroid]] — exact long
  * arithmetic, no shuffle), the update shuffles only (cid, pos) partial
  * sums — k·d rows per task after map-side combine — and collects k·d
  * rows to the driver (the bounded centroid-scale pull every trainer
  * here does). Nothing data-sized crosses an exchange.
  */
object KMeans {

  /** Exact lattice quantization: `floor(double(x) · scale)`. `scale`
    * must be a power of two so the product is exact in double and the
    * oracle's replay is bit-identical. */
  def latticeQuantize(v: Column, scale: Int): Column = {
    require(scale > 0 && (scale & (scale - 1)) == 0,
      s"scale must be a positive power of two, got $scale")
    transform(v, x => floor(x.cast("double") * lit(scale)).cast("long"))
  }

  /** Nearest-centroid id under exact integer L2; ties go to the LOWEST
    * cid (strict `<` over a cid-ascending scan — the oracle's
    * `ORDER BY dist, cid`). A compiled kernel with the centroid matrix
    * as a codegen reference object ([[graft.functions.expressions
    * .NearestLatticeCentroid]]) — the first cut composed this from
    * `aggregate`/`zip_with` builtins, but higher-order functions are
    * CodegenFallback (interpreted, ~0.35 ms/row at k=8 d=64, re-run
    * under the update pass's posexplode) — two orders too slow for a
    * full-corpus refinement pass. */
  def assignLattice(q: Column, centroids: Seq[(Int, Seq[Long])]): Column = {
    require(centroids.nonEmpty, "assignLattice: no centroids")
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.NearestLatticeCentroid(
        org.apache.spark.sql.graft.ColumnBridge.expression(q), centroids))
  }

  /** `iters` Lloyd iterations over `points(qCol: array<long>)` from
    * `seeds`; returns (cid, centroid, clusterSize) with clusterSize from
    * the final assignment. An empty cluster keeps its centroid (size 0).
    */
  def refineLattice(
      points: DataFrame,
      qCol: String,
      seeds: Seq[(Int, Seq[Long])],
      iters: Int): Seq[(Int, Seq[Long], Long)] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(seeds.map(_._1).distinct.size == seeds.size,
      "refineLattice: duplicate centroid ids in seeds")
    var cents: Seq[(Int, Seq[Long], Long)] =
      seeds.sortBy(_._1).map(s => (s._1, s._2, 0L))
    for (_ <- 1 to iters) {
      val cur = cents.map(c => (c._1, c._2))
      val sums = points
        .select(assignLattice(col(qCol), cur).as("cid"),
          posexplode(col(qCol)).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect() // k·d rows — centroid-scale, bounded
        .groupBy(_.getInt(0))
      cents = cur.map { case (cid, old) =>
        sums.get(cid) match {
          case Some(rows) =>
            val n = rows.head.getLong(3)
            val vec = rows.sortBy(_.getInt(1))
              .map(r => math.floor((2.0 * r.getLong(2) + n) / (2.0 * n)).toLong)
              .toSeq
            (cid, vec, n)
          case None => (cid, old, 0L)
        }
      }
    }
    cents
  }
}
