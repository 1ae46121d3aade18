package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r11 IVF scale rework: centroid assignment/probing is a
  * constant-size kernel expression whose centroid matrix rides as a
  * codegen reference object, so a many-hundred-centroid index plans and
  * codegens exactly like a 16-centroid one (the pre-r11 shape built one
  * `greatest(struct(dot(v, array(lit…))))` branch per centroid). */
class IvfScaleSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")

  test("256-centroid build: O(1) plan, whole-stage codegen, zero shuffle") {
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding",
      numCentroids = 256)
    assert(index.centroids.length == 256)

    val plan = index.assigned.queryExecution.executedPlan.toString
    // constant-size kernel, not an N-branch expression chain
    assert(!plan.contains("greatest"), plan)
    assert(plan.contains("graft_nearest_centroids"), plan)
    // assignment is a shuffle-free codegen'd scan: no Exchange anywhere
    // in the assigned lineage, and the Project runs inside a
    // WholeStageCodegen stage (the `*(n)` marker), i.e. no codegen
    // fallback at 256 centroids
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan)

    // every corpus row gets a live cluster from the 256 seeded ids
    val clusters = index.assigned.groupBy("cluster").count().collect()
    assert(clusters.forall(r => !r.isNullAt(0)))
    assert(clusters.map(_.getLong(1)).sum == emb.count())
  }

  test("kernel assignment matches a driver-side argmax exactly") {
    val index = Similarity.ivfBuild(emb.limit(300), "vec_id", "embedding",
      numCentroids = 32)
    val normed = index.centroids.map { case (cid, c) =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      cid -> (if (nrm == 0.0) c.map(_ => 0.0) else c.map(_ / nrm))
    }
    index.assigned.collect().foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      // same accumulation order as the kernel: left-to-right doubles;
      // ties break toward the smaller centroid id
      val best = normed.map { case (cid, c) =>
        var s = 0.0
        var j = 0
        while (j < v.length) { s += v(j) * c(j); j += 1 }
        (cid, s)
      }.maxBy { case (cid, s) => (s, -cid) }._1
      assert(r.getInt(2) == best, s"vec ${r.getLong(0)}")
    }
  }

  test("assignByJoin (broadcast DF + BoundedTopK(1)) agrees with the kernel") {
    val vecs = emb.limit(300)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val index = Similarity.ivfBuild(emb.limit(300), "vec_id", "embedding",
      numCentroids = 256)
    val viaKernel = index.assigned.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val viaJoin = Similarity.assignByJoin(vecs, index.centroids).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(viaJoin == viaKernel)
  }

  test("mixed-dimension vectors degrade per-centroid, never throw") {
    import spark.implicits._
    // all centroids are 64-dim; a 3-dim stray vector must yield a NULL
    // result from the kernel (no centroid matches its dimension) — not
    // an ArrayIndexOutOfBoundsException from indexing past a centroid —
    // and an ivfSearch probing with it must drop it, not fail the job
    val index = Similarity.ivfBuild(emb.limit(100), "vec_id", "embedding",
      numCentroids = 4)
    val stray = Seq((900000L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")

    val direct = stray.select(
      graft.functions.VectorFunctions.nearestCentroids(
        col("embedding"), index.centroids, 2).as("nc")).head()
    assert(direct.isNullAt(0), "mismatched dims must yield null, not throw")

    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .unionByName(stray)
    val out = Similarity.ivfSearch(index, queries, "vec_id", "embedding",
      k = 3, nprobe = 4).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getAs[Long]("query_id") == 900000L),
      "the stray query must be dropped, not matched")
  }

  test("autoCentroids: √(n/target) clamped to [4, 4096]") {
    assert(Similarity.autoCentroids(0L) == 4)
    assert(Similarity.autoCentroids(1024L) == 4)
    assert(Similarity.autoCentroids(64L * 4096) == 64)
    assert(Similarity.autoCentroids(200000L) == 56)
    assert(Similarity.autoCentroids(Long.MaxValue >> 8) == 4096)
  }

  test("approxRowCount scales its array-width assumption via " +
    "spark.graft.ann.assumedVectorBytes (the high-dim corpus knob)") {
    // a parquet-backed frame has no exact rowCount: the estimate divides
    // sizeInBytes by the assumed width, so 8x the width => ~1/8 the rows
    val frame = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val conf = "spark.graft.ann.assumedVectorBytes"
    val atDefault = Similarity.approxRowCount(frame)
    try {
      spark.conf.set(conf, "4096")
      val atHighDim = Similarity.approxRowCount(frame)
      assert(atHighDim < atDefault,
        s"wider assumed vectors must lower the estimate: $atHighDim !< $atDefault")
      assert(atDefault.toDouble / atHighDim > 4,
        s"8x width should cut the estimate severalfold: $atDefault / $atHighDim")
    } finally spark.conf.unset(conf)
  }

  test("numCentroids = 0 auto mode: nprobe-all search stays exact") {
    val corpus = emb.limit(400)
    val queries = emb.filter(col("vec_id") < 5)
    val index = Similarity.ivfBuild(corpus, "vec_id", "embedding",
      numCentroids = 0)
    assert(index.centroids.length == Similarity.autoCentroids(400L))
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val full = Similarity.ivfSearch(index, queries, "vec_id", "embedding", 5,
      nprobe = index.centroids.length)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    assert(full == exact)
  }
}
