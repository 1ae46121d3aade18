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
