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

  /** Exact long L2 distance to the nearest of `cents` — the D²(x, C)
    * term of k-means‖; a compiled kernel like [[assignLattice]]. */
  def minLatticeDist(q: Column, cents: Seq[Seq[Long]]): Column = {
    require(cents.nonEmpty, "minLatticeDist: no centroids")
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.NearestLatticeDistance(
        org.apache.spark.sql.graft.ColumnBridge.expression(q), cents))
  }

  /** Deterministic k-means‖ seeding (Bahmani et al. 2012, "Scalable
    * k-means++") on the lattice — the principled replacement for
    * take-the-first-k seeds, which planted-blob corpora forgive but real
    * skewed embedding spaces don't (a small far cluster whose ids sort
    * late never seeds, and Lloyd from inside one dense region can take
    * many iterations to discover it — KMeansSpec's under-recovery
    * property). Three phases, all relationally replayable:
    *
    *  1. OVERSAMPLING ROUNDS: start from the single point with the lowest
    *     hash priority; each round computes D²(x, C) for every point (one
    *     scan, compiled kernel), then selects x iff
    *     `u(x)·φ < ℓ·M·D²(x)` — Bahmani's p = min(1, ℓ·D²/φ) sampling
    *     (φ = Σ D²) with the point's hash priority u(x)/M standing in for
    *     the uniform draw. The priority is two rounds of the Lehmer
    *     MINSTD generator (`u = 48271²·id mod (2³¹−1)`, exact in long:
    *     48271·(M−1) < 2⁴⁷) rather than xxhash64 so the DuckDB oracle can
    *     replay the draw bit-exactly; the comparison cross-multiplies in
    *     DECIMAL (u·φ overflows long at 100 TB — the corpus_drift
    *     lesson). Selection pulls at most `8·ℓ` rows per round
    *     (TakeOrdered by (D² desc, u, id) — expected yield is ℓ since
    *     Σ ℓ·D²/φ = ℓ, the cap only binds adversarially), so the driver
    *     never holds more than 1 + rounds·8ℓ candidate vectors.
    *  2. WEIGHTS: one scan assigns every point to its nearest candidate
    *     ([[assignLattice]], ties to the lowest candidate id); the
    *     per-candidate counts are the Bahmani weights (|C| rows).
    *  3. WEIGHTED REDUCTION to k, driver-side over the bounded candidate
    *     set: greedy weighted farthest-first — start at the heaviest
    *     candidate (tie: lowest id), then repeatedly add the candidate
    *     maximizing `w(c) · min_{s∈chosen} D²(c, s)` (tie: lowest id).
    *     Deterministic, hence replayable as k−1 unrolled SQL steps, and
    *     exactly the role Bahmani's weighted k-means++ plays: big-mass
    *     far-apart candidates win; duplicates (D² = 0) never win while a
    *     positive-score candidate remains. Scores in BigInt (w·D²
    *     overflows long at corpus scale).
    *
    * Returns k seeds numbered 0..k−1 IN PICK ORDER. Fails loudly if the
    * corpus holds fewer than k distinct points after a top-up pull of the
    * lowest-priority non-candidates (tiny-corpus fallback, also
    * replayed). */
  def parallelSeeds(
      points: DataFrame,
      idCol: String,
      qCol: String,
      k: Int,
      rounds: Int = 2,
      oversample: Int = 0): Seq[(Int, Seq[Long])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val l = if (oversample > 0) oversample else 2 * k
    val cap = 8 * l
    val M = 2147483647L // 2^31 − 1, the Lehmer modulus
    val uCol = pmod(lit(48271L) * pmod(lit(48271L) *
      pmod(col(idCol).cast("long"), lit(M)), lit(M)), lit(M))
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(qCol).as("q"), uCol.as("u"))

    var cands: Seq[(Long, Seq[Long])] = pts.orderBy("u", "id").limit(1)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    require(cands.nonEmpty, "parallelSeeds: empty corpus")

    for (_ <- 1 to rounds) {
      val withD = pts.withColumn("d", minLatticeDist(col("q"), cands.map(_._2)))
      val phi = withD.agg(
        sum(col("d").cast(org.apache.spark.sql.types.DecimalType(30, 0))))
        .head().getDecimal(0)
      // φ = 0 ⇒ every point coincides with a candidate; nothing to sample
      if (phi != null && phi.signum > 0) {
        require(phi.precision <= 25,
          s"parallelSeeds: φ needs ${phi.precision} digits — past the " +
            "u·φ DECIMAL(38) headroom; shrink the lattice scale")
        val lhs = col("u").cast(org.apache.spark.sql.types.DecimalType(12, 0)) *
          lit(phi)
        val rhs = lit(java.math.BigDecimal.valueOf(l).multiply(
          java.math.BigDecimal.valueOf(M))) *
          col("d").cast(org.apache.spark.sql.types.DecimalType(20, 0))
        // candidates re-select never: their D² is 0, so rhs = 0 ≤ lhs
        val sel = withD.filter(lhs < rhs)
          .orderBy(col("d").desc, col("u"), col("id"))
          .limit(cap)
          .select("id", "q").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1)))
        cands = cands ++ sel
      }
    }

    // tiny-corpus top-up: the lowest-priority non-candidates
    if (cands.size < k) {
      val have = cands.map(_._1)
      val extra = pts.filter(!col("id").isInCollection(have))
        .orderBy("u", "id").limit(k - cands.size)
        .select("id", "q").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      cands = cands ++ extra
    }
    require(cands.size >= k,
      s"parallelSeeds: only ${cands.size} candidates for k = $k")

    // Bahmani weights: one assignment scan, |C| counted rows back
    val byId = cands.sortBy(_._1)
    val idx = byId.zipWithIndex.map { case ((_, v), i) => (i, v) }
    val wMap = pts.select(assignLattice(col("q"), idx).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val weighted = byId.zipWithIndex.map { case ((id, v), i) =>
      (id, v, wMap.getOrElse(i, 0L))
    }

    // greedy weighted farthest-first reduction, all-driver over ≤1+8ℓR rows
    def d2(a: Seq[Long], b: Seq[Long]): BigInt =
      a.lazyZip(b).map((x, y) => BigInt(x - y) * BigInt(x - y)).sum
    val first = weighted.minBy { case (id, _, w) => (-w, id) }
    var chosen = Vector(first)
    var rest = weighted.filterNot(_._1 == first._1)
    while (chosen.size < k) {
      val next = rest.minBy { case (id, v, w) =>
        (-(BigInt(w) * chosen.map(s => d2(v, s._2)).min), id)
      }
      chosen :+= next
      rest = rest.filterNot(_._1 == next._1)
    }
    chosen.zipWithIndex.map { case ((_, v, _), i) => (i, v) }
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
