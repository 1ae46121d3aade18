package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.sources.PqRepo

/** Product quantization (r15): codebook training, the encode/LUT/ADC
  * kernels, the flat ADC search, and the persisted IVF-PQ index. */
class PqSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
      r.getAs[Int]("rank"))).toSet

  test("pqTrain: deterministic, rectangular, dim-divisibility enforced") {
    val a = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 3, sampleRows = 256)
    val b = Similarity.pqTrain(emb.repartition(7), "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 3, sampleRows = 256)
    assert(a == b, "training must be layout-independent")
    assert(a.m == 8 && a.ksub == 16 && a.dsub == 8 && a.dim == 64)
    assert(a.books.forall(_.size == a.ksub))
    assert(a.books.forall(_.forall(_.size == a.dsub)))
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(emb, "vec_id", "embedding", m = 7, ksub = 8)
    }
  }

  test("PqEncode matches a driver-side argmin-L2 reference; " +
    "mis-dimensioned vectors yield null codes") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 3, sampleRows = 256)
    val rows = emb.limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val got = Similarity.pqEncode(emb.limit(50), "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (id, v) =>
      val expect = books.books.zipWithIndex.map { case (book, s) =>
        val xs = v.slice(s * books.dsub, (s + 1) * books.dsub)
        book.zipWithIndex.minBy { case (cw, c) =>
          (xs.zip(cw).map { case (x, w) => (x - w) * (x - w) }.sum, c)
        }._2
      }
      assert(got(id) == expect, s"id=$id")
    }
    // a vector of the wrong dimension encodes as null, not garbage
    import spark.implicits._
    val short = Seq((1L, Seq.fill(63)(0.5))).toDF("vec_id", "embedding")
    val r = short.select(
      VectorFunctions.pqEncode(col("embedding"), books.books)).head()
    assert(r.isNullAt(0))
  }

  test("ADC score via LUT ≡ cosine(query, reconstruction) rank order: " +
    "rerank-all pqTopK reproduces brute force exactly") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 4, sampleRows = 1024)
    val queries = emb.filter(col("vec_id") < 10)
    val pq = topSet(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      books, k = 5, rerankDepth = Int.MaxValue))
    val brute = topSet(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    assert(pq == brute && pq.nonEmpty)
  }

  test("partial-depth pqTopK keeps high recall at a fraction of the scan") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 4, sampleRows = 1024)
    val queries = emb.filter(col("vec_id") < 10)
    val truth = topSet(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5)).map(t => (t._1, t._2))
    val partial = topSet(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      books, k = 5, rerankDepth = 75)).map(t => (t._1, t._2))
    val recall = partial.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("recallEstimate covers the PQ path: rerank-all reads 1.0, partial " +
    "depth reads a real fraction") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 4, sampleRows = 1024)
    val exact = Similarity.recallEstimate(emb, "vec_id", "embedding",
      k = 5, sampleQueries = 8)(q => Similarity.pqTopK(emb, q,
      "vec_id", "embedding", books, k = 5, rerankDepth = Int.MaxValue))
    assert(exact.recall == 1.0, exact.toString)
    val partial = Similarity.recallEstimate(emb, "vec_id", "embedding",
      k = 5, sampleQueries = 8)(q => Similarity.pqTopK(emb, q,
      "vec_id", "embedding", books, k = 5, rerankDepth = 20))
    assert(partial.recall > 0.3 && partial.possible == exact.possible,
      partial.toString)
  }

  test("persisted IVF-PQ index: codebooks/centroids roundtrip exactly, " +
    "layout is cluster-partitioned, searches ≡ inline, " +
    "nprobe-all × rerank-all ≡ brute force") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_ivfpq").toString)
    val built = Similarity.ivfBuild(emb, "vec_id", "embedding",
      numCentroids = 8, kmeansIters = 1)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 3, sampleRows = 256)
    Similarity.writeIvfPqIndex(repo, built, books, "ann", "e")

    val dirs = new java.io.File(
      repo.tablePath("ann", "e_ivfpq").toUri.getPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.nonEmpty, dirs.mkString(","))

    val idx = Similarity.readIvfPqIndex(repo, "ann", "e")
    val (cents, books2, coded) = (idx.centroids, idx.books, idx.coded)
    assert(cents == built.centroids)
    assert(books2 == books, "codebooks must roundtrip exactly")
    assert(!idx.residual, "default layout persists residual = false")
    // the persisted coded scan carries no float vectors
    assert(!coded.schema.fieldNames.contains("v"))

    val queries = emb.filter(col("vec_id") < 5)
    val full = topSet(Similarity.ivfPqSearch(cents, books2, coded, emb,
      queries, "vec_id", "embedding", k = 4, nprobe = 8,
      rerankDepth = Int.MaxValue))
    val brute = topSet(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 4))
    assert(full == brute && full.nonEmpty)

    // partial probe agrees with an inline (unpersisted) run of the same
    // geometry — persistence changes nothing but the storage
    val inlineCoded = built.assigned.select(col("id"), col("cluster"),
      VectorFunctions.pqEncode(col("v"), books.books).as("codes"))
    val p1 = topSet(Similarity.ivfPqSearch(cents, books2, coded, emb,
      queries, "vec_id", "embedding", k = 4, nprobe = 3, rerankDepth = 50))
    val p2 = topSet(Similarity.ivfPqSearch(built.centroids, books,
      inlineCoded, emb, queries, "vec_id", "embedding", k = 4, nprobe = 3,
      rerankDepth = 50))
    assert(p1 == p2 && p1.nonEmpty)
  }

  test("residual IVF-PQ (IVFADC): persisted flag drives decode, coarse " +
    "recall DOMINATES raw-vector PQ at equal m, nprobe-all × rerank-all " +
    "≡ brute force") {
    import spark.implicits._
    // Planted geometry: 4 directionally-orthogonal clusters (Walsh rows
    // × 50) × 16 local ±1 patterns. Raw PQ at ksub = 4 must spend its
    // codewords separating cluster offsets (8 distinct subvectors per
    // subspace), collapsing the local detail; residual codebooks see
    // only the 2 distinct local subvectors per subspace and reconstruct
    // EXACTLY — the classical IVFADC win at equal m.
    val signs = Seq(
      Seq(1, 1, 1, 1, 1, 1, 1, 1), Seq(1, -1, 1, -1, 1, -1, 1, -1),
      Seq(1, 1, -1, -1, 1, 1, -1, -1), Seq(1, -1, -1, 1, 1, -1, -1, 1))
    val centroids = signs.zipWithIndex.map {
      case (sgn, c) => c -> sgn.map(_ * 50.0)
    }
    def delta(p: Int): Seq[Double] = (0 until 8).map { d =>
      val base = if (((p >> (d / 2)) & 1) == 1) 1.0 else -1.0
      if (d % 2 == 0) base else -base
    }
    val rows = for { c <- 0 until 4; p <- 0 until 16 } yield {
      val v = centroids(c)._2.zip(delta(p)).map { case (o, dl) => o + dl }
      ((c * 16 + p).toLong, v, c)
    }
    val corpusDf = rows.map { case (id, v, _) => (id, v) }
      .toDF("vec_id", "embedding")
    val idxIn = Similarity.IvfIndex(centroids, rows.toDF("id", "v", "cluster"))
    val queries = (0 until 4).map { c =>
      val v = centroids(c)._2.zip(delta(5)).map { case (o, dl) => o + dl }
      ((1000 + c).toLong, v.updated(0, v.head + 0.1))
    }.toDF("vec_id", "embedding")
    val truth = topSet(Similarity.bruteForceTopK(corpusDf, queries,
      "vec_id", "embedding", k = 3))

    val rawBooks = Similarity.pqTrain(corpusDf, "vec_id", "embedding",
      m = 4, ksub = 4, kmeansIters = 8, sampleRows = 64)
    val resBooks = Similarity.pqTrainResidual(idxIn,
      m = 4, ksub = 4, kmeansIters = 8, sampleRows = 64)

    val repoRaw = PqRepo(spark, Files.createTempDirectory("idx_pqraw").toString)
    val repoRes = PqRepo(spark, Files.createTempDirectory("idx_pqres").toString)
    Similarity.writeIvfPqIndex(repoRaw, idxIn, rawBooks, "ann", "e")
    Similarity.writeIvfPqIndex(repoRes, idxIn, resBooks, "ann", "e",
      residual = true)
    val raw = Similarity.readIvfPqIndex(repoRaw, "ann", "e")
    val res = Similarity.readIvfPqIndex(repoRes, "ann", "e")
    assert(res.residual && !raw.residual,
      "the layout flag must persist with the index")

    // coarse-limited: rerankDepth = k, so the ADC ranking alone picks
    // the candidate set — the PQ-quality probe
    def recallOf(idx: Similarity.IvfPqIndexData): Double = {
      val got = topSet(Similarity.ivfPqSearch(idx, corpusDf, queries,
        "vec_id", "embedding", k = 3, nprobe = 4, rerankDepth = 3))
        .map(t => (t._1, t._2))
      val want = truth.map(t => (t._1, t._2))
      got.intersect(want).size.toDouble / want.size
    }
    val rr = recallOf(res)
    val rw = recallOf(raw)
    assert(rr > rw, s"residual recall $rr must dominate raw-PQ recall $rw")
    assert(rr >= 0.9, s"residual reconstruction is exact here: recall $rr")

    // the composed oracle hook holds on the residual layout too
    val full = topSet(Similarity.ivfPqSearch(res, corpusDf, queries,
      "vec_id", "embedding", k = 3, nprobe = 4, rerankDepth = Int.MaxValue))
    assert(full == truth && full.nonEmpty)
  }

  test("appendToIvfPqIndex on a residual index: the batch encodes " +
    "RESIDUALS (meta-driven, not caller-asserted) and stays searchable") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_resapp").toString)
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val built = Similarity.ivfBuild(base, "vec_id", "embedding",
      numCentroids = 8, kmeansIters = 1)
    val books = Similarity.pqTrainResidual(built,
      m = 8, ksub = 16, kmeansIters = 3, sampleRows = 256)
    Similarity.writeIvfPqIndex(repo, built, books, "ann", "e", residual = true)
    // the append call carries NO residual flag — it must recover the
    // layout from the persisted meta and encode x − centroid
    Similarity.appendToIvfPqIndex(repo, batch, "vec_id", "embedding", "ann", "e")
    val idx = Similarity.readIvfPqIndex(repo, "ann", "e")
    assert(idx.residual && idx.coded.count() == emb.count())
    val queries = emb.filter(col("vec_id") < 5)
    val full = topSet(Similarity.ivfPqSearch(idx, emb, queries,
      "vec_id", "embedding", k = 4, nprobe = 8, rerankDepth = Int.MaxValue))
    val brute = topSet(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 4))
    assert(full == brute && full.nonEmpty)
  }

  test("appendToIvfPqIndex: batch encodes with frozen geometry, lands in " +
    "its clusters, search covers it, re-append idempotent, moved id aborts") {
    val repo = PqRepo(spark, Files.createTempDirectory("idx_ivfpq_app").toString)
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val built = Similarity.ivfBuild(base, "vec_id", "embedding",
      numCentroids = 8, kmeansIters = 1)
    val books = Similarity.pqTrain(base, "vec_id", "embedding",
      m = 8, ksub = 16, kmeansIters = 3, sampleRows = 256)
    Similarity.writeIvfPqIndex(repo, built, books, "ann", "e")
    Similarity.appendToIvfPqIndex(repo, batch, "vec_id", "embedding", "ann", "e")

    val idx = Similarity.readIvfPqIndex(repo, "ann", "e")
    val (cents, books2, coded) = (idx.centroids, idx.books, idx.coded)
    assert(coded.count() == emb.count(), "appended rows must be in the index")
    // the merged index serves the FULL corpus exactly at nprobe-all ×
    // rerank-all — proving appended codes are really searchable
    val queries = emb.filter(col("vec_id") < 5)
    val full = topSet(Similarity.ivfPqSearch(cents, books2, coded, emb,
      queries, "vec_id", "embedding", k = 4, nprobe = 8,
      rerankDepth = Int.MaxValue))
    val brute = topSet(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 4))
    assert(full == brute && full.nonEmpty)

    // idempotent re-append
    Similarity.appendToIvfPqIndex(repo, batch, "vec_id", "embedding", "ann", "e")
    assert(Similarity.readIvfPqIndex(repo, "ann", "e").coded.count() == emb.count())

    // a re-ingested id whose embedding moved clusters aborts loudly
    import spark.implicits._
    val movedId = batch.select("vec_id").head().getLong(0)
    val far = emb.filter(col("vec_id") =!= movedId)
      .orderBy(col("vec_id").desc).select("embedding").head()
      .getSeq[Float](0).map(x => -x)
    val movedBatch = Seq((movedId, far)).toDF("vec_id", "embedding")
    val before = Similarity.readIvfPqIndex(repo, "ann", "e").coded.count()
    val e = intercept[IllegalStateException] {
      Similarity.appendToIvfPqIndex(repo, movedBatch, "vec_id", "embedding",
        "ann", "e")
    }
    assert(e.getMessage.contains("moved clusters"), e.getMessage)
    assert(Similarity.readIvfPqIndex(repo, "ann", "e").coded.count() == before,
      "index must be untouched after the abort")
  }
}
