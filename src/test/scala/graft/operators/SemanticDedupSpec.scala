package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup composition: identical vectors always collapse (the
  * collapse emits their pairs before clustering), near-identical
  * distinct vectors collapse within their cluster (the paper's
  * within-cluster epsilon-dedup), far vectors survive, and the result
  * is partitioning-invariant. */
class SemanticDedupSpec extends SparkSpec {

  // two well-separated blobs in R^4 plus exact copies and a near-copy:
  //   blob A around e1: ids 1 (anchor), 2 (exact copy), 3 (cos ~0.99997)
  //   blob B around e2: ids 10 (anchor), 11 (exact copy)
  //   lone far vector: id 20 (e3 direction, no near neighbor)
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0, 0.0)),
      (3L, Seq(1.0, 0.008, 0.0, 0.0)),
      (10L, Seq(0.0, 1.0, 0.0, 0.0)),
      (11L, Seq(0.0, 1.0, 0.0, 0.0)),
      (20L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
  }

  test("identical + near-identical collapse to component minimum; " +
    "far vectors survive") {
    val (out, stats) = Similarity.semanticDedupWithStats(
      corpus, "vec_id", "embedding", minCos = 0.999, numClusters = 2,
      refineIters = 1)
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    // 2 is an exact copy of 1; 3 is cosine-near 1 and shares its cluster
    // (blob separation >> lattice spacing) -> component {1,2,3} keeps 1
    assert(kept == Set(1L, 10L, 20L), s"kept $kept")
    assert(stats.converged)
  }

  test("threshold excludes the near-copy when raised above its cosine") {
    // cos(1,3) ~ 0.99997 < 0.9999995 -> only the exact copies collapse
    val out = Similarity.semanticDedup(
      corpus, "vec_id", "embedding", minCos = 0.9999995, numClusters = 2,
      refineIters = 1)
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 10L, 20L), s"kept $kept")
  }

  test("partitioning invariance") {
    val a = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      minCos = 0.999, numClusters = 2, refineIters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val b = Similarity.semanticDedup(corpus.repartition(5), "vec_id",
      "embedding", minCos = 0.999, numClusters = 2, refineIters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("duplicate crowding: a large identical clique cannot drag " +
    "centroids or escape the collapse") {
    import spark.implicits._
    // 50 copies of one boilerplate vector + two distinct singles: the
    // clique must collapse to its min id regardless of clustering, and
    // clustering trains on DISTINCT vectors (3 points), so k=2 seeding
    // cannot fail on "fewer distinct points than k" from copies alone
    val crowd = (100L until 150L).map(i => (i, Seq(0.5, 0.5, 0.0, 0.0))) ++
      Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.0, 0.0, 0.0, 1.0)))
    val out = Similarity.semanticDedup(crowd.toDF("vec_id", "embedding"),
      "vec_id", "embedding", minCos = 0.999, numClusters = 2,
      refineIters = 1)
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 1L, 2L), s"kept $kept")
  }
}
