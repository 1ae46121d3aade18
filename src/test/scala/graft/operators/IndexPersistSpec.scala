package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.PqRepo

/** Persisted ANN indexes (r11): the repo is the materialization layer —
  * build once, search many — and the persisted search paths must be
  * result-identical to the inline ones. */
class IndexPersistSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
      r.getAs[Int]("rank"))).toSet

  test("quantized index roundtrips and searches identically to inline") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_q8").toString)
    Similarity.writeQuantizedIndex(repo, emb, "vec_id", "embedding", "ann", "e")
    val coded = Similarity.readQuantizedIndex(repo, "ann", "e")
    // codes roundtrip exactly
    val inlineCodes = Similarity.quantize(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getSeq[Int](3))).toMap
    coded.collect().foreach { r =>
      val (qmin, qmax, cs) = inlineCodes(r.getLong(0))
      assert(r.getDouble(1) == qmin && r.getDouble(2) == qmax)
      assert(r.getSeq[Int](3) == cs)
    }
    val queries = emb.filter(col("vec_id") < 5)
    // partial-depth coarse cut over the persisted index ≡ inline path
    val persisted = topSet(Similarity.quantizedTopKIndexed(
      coded, emb, queries, "vec_id", "embedding", k = 4, rerankDepth = 50))
    val inline = topSet(Similarity.quantizedTopK(
      emb, queries, "vec_id", "embedding", k = 4, rerankDepth = 50))
    assert(persisted == inline && persisted.nonEmpty)
  }

  test("IVF index roundtrips (cluster-partitioned layout) and searches identically") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_ivf").toString)
    val built = Similarity.ivfBuild(emb, "vec_id", "embedding",
      numCentroids = 8, kmeansIters = 1)
    Similarity.writeIvfIndex(repo, built, "ann", "e")

    // the persisted layout is one directory per cluster
    val dirs = new java.io.File(
      repo.tablePath("ann", "e_ivf").toUri.getPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.nonEmpty, dirs.mkString(","))

    val index = Similarity.readIvfIndex(repo, "ann", "e")
    assert(index.centroids == built.centroids)

    val queries = emb.filter(col("vec_id") < 5)
    // both the exact (nprobe-all) and approximate (partial probe) searches
    // agree between the persisted and in-memory index
    Seq(8, 3).foreach { np =>
      val persisted = topSet(Similarity.ivfSearch(index, queries,
        "vec_id", "embedding", k = 4, nprobe = np))
      val inline = topSet(Similarity.ivfSearch(built, queries,
        "vec_id", "embedding", k = 4, nprobe = np))
      assert(persisted == inline && persisted.nonEmpty, s"nprobe=$np")
    }
  }

  test("appendToIvfIndex: batch lands in its clusters, search covers it, re-append is idempotent") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_app").toString)
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val built = Similarity.ivfBuild(base, "vec_id", "embedding",
      numCentroids = 8, kmeansIters = 1)
    Similarity.writeIvfIndex(repo, built, "ann", "a")
    Similarity.appendToIvfIndex(repo, batch, "vec_id", "embedding", "ann", "a")
    val index = Similarity.readIvfIndex(repo, "ann", "a")
    assert(index.assigned.count() == emb.count())
    // exact (nprobe-all) search over the merged index covers the whole
    // corpus, appended rows included
    val queries = emb.filter(col("vec_id") < 5)
    val merged = topSet(Similarity.ivfSearch(index, queries,
      "vec_id", "embedding", k = 4, nprobe = 8))
    val exact = topSet(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 4))
    assert(merged == exact)
    // idempotent: re-appending the same batch changes nothing
    Similarity.appendToIvfIndex(repo, batch, "vec_id", "embedding", "ann", "a")
    assert(Similarity.readIvfIndex(repo, "ann", "a").assigned.count() == emb.count())
  }

  test("appendToQuantizedIndex: upsert by id, re-quantized rows replace") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_qapp").toString)
    Similarity.writeQuantizedIndex(repo, emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", "ann", "q")
    Similarity.appendToQuantizedIndex(repo, emb.filter(col("vec_id") >= 100),
      "vec_id", "embedding", "ann", "q")
    val all = Similarity.readQuantizedIndex(repo, "ann", "q")
    assert(all.count() == emb.count())
    // upsert: re-appending an overlapping slice keeps one row per id
    Similarity.appendToQuantizedIndex(repo, emb.filter(col("vec_id") < 200),
      "vec_id", "embedding", "ann", "q")
    val after = Similarity.readQuantizedIndex(repo, "ann", "q")
    assert(after.count() == emb.count())
    assert(after.select("vec_id").distinct().count() == emb.count())
  }

  test("writePartitioned promotes atomically: no tmp dir left, table readable") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_part").toString)
    val built = Similarity.ivfBuild(emb.limit(100), "vec_id", "embedding",
      numCentroids = 4)
    Similarity.writeIvfIndex(repo, built, "ann", "p")
    val schemaDir = new java.io.File(
      repo.tablePath("ann", "p_ivf").toUri.getPath).getParentFile
    assert(!schemaDir.listFiles().map(_.getName).exists(_.startsWith("_tmp_")),
      schemaDir.listFiles().map(_.getName).mkString(","))
    assert(repo.table("ann", "p_ivf").count() == 100)
  }
}
