package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def qdf(rows: Seq[Seq[Long]], parts: Int = 4) =
    rows.map(Tuple1(_)).toDF("q").repartition(parts)

  test("refineLattice recovers planted well-separated blobs exactly " +
    "(centroids = floored blob means, sizes = blob sizes)") {
    // three blobs around (0,0), (100,100), (-100,50); seeds inside each
    val blobA = Seq.tabulate(30)(i => Seq((i % 3 - 1).toLong, (i % 5 - 2).toLong))
    val blobB = Seq.tabulate(50)(i => Seq(100L + i % 4, 100L - i % 3))
    val blobC = Seq.tabulate(20)(i => Seq(-100L - i % 2, 50L + i % 7))
    val seeds = Seq(0 -> Seq(0L, 0L), 1 -> Seq(100L, 100L), 2 -> Seq(-100L, 50L))
    val out = KMeans.refineLattice(qdf(blobA ++ blobB ++ blobC), "q", seeds, 2)
    def mean(blob: Seq[Seq[Long]], d: Int): Long = {
      val s = blob.map(_(d)).sum; val n = blob.size
      math.floor((2.0 * s + n) / (2.0 * n)).toLong
    }
    val byCid = out.map(c => c._1 -> c).toMap
    assert(byCid(0)._2 == Seq(mean(blobA, 0), mean(blobA, 1)) && byCid(0)._3 == 30L)
    assert(byCid(1)._2 == Seq(mean(blobB, 0), mean(blobB, 1)) && byCid(1)._3 == 50L)
    assert(byCid(2)._2 == Seq(mean(blobC, 0), mean(blobC, 1)) && byCid(2)._3 == 20L)
  }

  test("bit-deterministic across partitionings") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(500)(Seq.fill(8)(rnd.nextInt(200).toLong - 100))
    val seeds = pts.take(5).zipWithIndex.map { case (v, i) => i -> v }
    val a = KMeans.refineLattice(qdf(pts, 1), "q", seeds, 3)
    val b = KMeans.refineLattice(qdf(pts, 13), "q", seeds, 3)
    assert(a == b)
  }

  test("assignment ties go to the lowest cid (both in assignLattice and " +
    "end-to-end)") {
    // point 5 is equidistant (25) to centroids at 0 and 10
    val got = qdf(Seq(Seq(5L)))
      .select(KMeans.assignLattice(col("q"),
        Seq(1 -> Seq(10L), 0 -> Seq(0L))).as("cid"))
      .as[Int].collect()
    assert(got.sameElements(Array(0)))
  }

  test("an empty cluster keeps its seed centroid with size 0") {
    val pts = Seq.fill(10)(Seq(0L, 0L))
    val seeds = Seq(0 -> Seq(0L, 0L), 1 -> Seq(999L, 999L))
    val out = KMeans.refineLattice(qdf(pts), "q", seeds, 2)
    val byCid = out.map(c => c._1 -> c).toMap
    assert(byCid(1)._2 == Seq(999L, 999L) && byCid(1)._3 == 0L)
    assert(byCid(0)._3 == 10L)
  }

  test("assignLattice matches a driver-side exact argmin on random data") {
    val rnd = new scala.util.Random(7)
    val cents = Seq.tabulate(6)(i => i -> Seq.fill(4)(rnd.nextInt(100).toLong))
    val pts = Seq.fill(200)(Seq.fill(4)(rnd.nextInt(100).toLong))
    def driverArgmin(p: Seq[Long]): Int =
      cents.sortBy(_._1).minBy { case (cid, c) =>
        (p.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }._1
    val got = qdf(pts, 3)
      .select(col("q"), KMeans.assignLattice(col("q"), cents).as("cid"))
      .collect().map(r => r.getSeq[Long](0) -> r.getInt(1))
    got.foreach { case (p, cid) => assert(cid == driverArgmin(p)) }
  }

  private def iddf(rows: Seq[Seq[Long]], parts: Int = 4) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "q").repartition(parts)

  test("parallelSeeds recovers planted blobs that lowest-id seeding " +
    "demonstrably under-recovers") {
    // 200-point blob at the origin holds ALL the lowest ids; two 20-point
    // blobs far away hold only late ids — the k-lowest-ids seeding puts
    // every seed inside the big blob. B and C sit NEAR each other
    // (60 apart, 700 from A): Lloyd from inside A sends ONE centroid to
    // the far mass and it serves both blobs forever while two centroids
    // split A — the under-recovery k-means‖'s weighted greedy avoids
    // (after picking a B candidate, w·D² makes the C candidate beat every
    // remaining A candidate)
    val blobA = Seq.tabulate(200)(i => Seq((i % 5).toLong, (i % 7).toLong))
    val blobB = Seq.tabulate(20)(i => Seq(500L + i % 3, 500L - i % 4))
    val blobC = Seq.tabulate(20)(i => Seq(500L + i % 2, 560L + i % 5))
    val all = blobA ++ blobB ++ blobC
    val df = iddf(all)
    def mean(blob: Seq[Seq[Long]], d: Int): Long = {
      val s = blob.map(_(d)).sum; val n = blob.size
      math.floor((2.0 * s + n) / (2.0 * n)).toLong
    }
    val want = Set(
      (Seq(mean(blobA, 0), mean(blobA, 1)), 200L),
      (Seq(mean(blobB, 0), mean(blobB, 1)), 20L),
      (Seq(mean(blobC, 0), mean(blobC, 1)), 20L))

    val lowSeeds = all.take(3).zipWithIndex.map { case (v, i) => (i, v) }
    val low = KMeans.refineLattice(df.select("q"), "q", lowSeeds, 2)
    assert(low.map(c => (c._2, c._3)).toSet != want,
      "fixture broken: lowest-id seeding recovered the blobs anyway")

    val seeds = KMeans.parallelSeeds(df, "id", "q", k = 3, rounds = 2)
    val out = KMeans.refineLattice(df.select("q"), "q", seeds, 2)
    assert(out.map(c => (c._2, c._3)).toSet == want,
      s"k-means‖ seeding failed to recover the blobs: $out")
  }

  test("parallelSeeds is bit-deterministic across partitionings") {
    val rnd = new scala.util.Random(23)
    val pts = Seq.fill(300)(Seq.fill(4)(rnd.nextInt(200).toLong - 100))
    val a = KMeans.parallelSeeds(iddf(pts, 1), "id", "q", 5)
    val b = KMeans.parallelSeeds(iddf(pts, 13), "id", "q", 5)
    assert(a == b)
  }

  test("parallelSeeds tiny-corpus top-up yields all points; k > n fails loudly") {
    val df = iddf(Seq(Seq(0L, 0L), Seq(10L, 10L), Seq(20L, 20L)))
    val seeds = KMeans.parallelSeeds(df, "id", "q", 3)
    assert(seeds.map(_._1) == Seq(0, 1, 2))
    assert(seeds.map(_._2).toSet ==
      Set(Seq(0L, 0L), Seq(10L, 10L), Seq(20L, 20L)))
    intercept[IllegalArgumentException] {
      KMeans.parallelSeeds(df, "id", "q", 4)
    }
  }

  test("minLatticeDist matches a driver-side exact min-L2") {
    val cents = Seq(Seq(0L, 0L), Seq(10L, -5L))
    val pts = Seq(Seq(1L, 1L), Seq(9L, -5L), Seq(-3L, 2L))
    def driverMin(p: Seq[Long]): Long = cents.map(c =>
      p.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
    val got = qdf(pts, 2)
      .select(col("q"), KMeans.minLatticeDist(col("q"), cents).as("d"))
      .collect().map(r => r.getSeq[Long](0) -> r.getLong(1))
    got.foreach { case (p, d) => assert(d == driverMin(p)) }
  }

  test("latticeQuantize is exact for power-of-two scales and rejects " +
    "non-powers") {
    val df = Seq(Tuple1(Seq(0.5f, -0.25f, 0.999f, -1.0f))).toDF("v")
    val q = df.select(KMeans.latticeQuantize(col("v"), 64).as("q"))
      .as[Seq[Long]].head()
    assert(q == Seq(32L, -16L, math.floor(0.999f.toDouble * 64).toLong, -64L))
    intercept[IllegalArgumentException] { KMeans.latticeQuantize(col("v"), 63) }
    intercept[IllegalArgumentException] { KMeans.latticeQuantize(col("v"), 0) }
    intercept[IllegalArgumentException] {
      KMeans.refineLattice(df, "v", Seq(0 -> Seq(0L)), 0)
    }
  }
}
