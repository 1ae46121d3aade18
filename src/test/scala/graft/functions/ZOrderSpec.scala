package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.PqRepo

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def naiveZ(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; (v, c) <- vals.zipWithIndex)
      z |= ((v >> i) & 1L) << (i * vals.size + c)
    z
  }

  test("zValue equals the naive bit interleave (2 and 3 columns)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got2.toSeq == rows.map(r => naiveZ(Seq(r._1, r._2), 16)))
    val got3 = df.select(ZOrder.zValue(Seq(col("x"), col("y"), col("w")), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got3.toSeq == rows.map(r => naiveZ(Seq(r._1, r._2, r._3), 16)))
  }

  test("zValue orders locality: quadrant prefix matches high bits") {
    // the top z-bits are exactly the quadrant: points in the same
    // half-space on every dimension share the leading bit group
    val df = Seq((3L, 200L), (5L, 210L), (200L, 3L)).toDF("x", "y")
    val zs = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(_.getLong(0))
    // first two points share the (low x, high y) quadrant; third doesn't
    assert((zs(0) >> 14) == (zs(1) >> 14))
    assert((zs(0) >> 14) != (zs(2) >> 14))
  }

  test("normalize maps min to 0, max to 2^bits-1, constants to 0") {
    val df = Seq(0.0, 2.5, 10.0).toDF("v")
    val out = df.select(
      ZOrder.normalize(col("v"), lit(0.0), lit(10.0), 8).as("n"),
      ZOrder.normalize(col("v"), lit(5.0), lit(5.0), 8).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSeq == Seq(0L, 63L, 255L))
    assert(out.forall(_._2 == 0L))
  }

  test("writeZOrdered files cover small rectangles in BOTH dimensions " +
    "where writeSorted only serves its leading column") {
    val repoDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val repo = new PqRepo(spark, repoDir)
    val grid = spark.range(10000).select(
      (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"))

    repo.writeZOrdered(grid, "lay", "zed", Seq("x", "y"), numFiles = 16, bits = 8)
    repo.writeSorted(grid, "lay", "sorted", Seq("x", "y"), numFiles = 16)

    def avgRange(table: String, c: String): Double = {
      val dir = new java.io.File(s"$repoDir/lay/$table.parquet")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length > 8, s"expected many files, got ${files.length}")
      val widths = files.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(col(c)), max(col(c))).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      widths.sum / widths.length
    }
    // both tables hold identical rows
    assert(repo.table("lay", "zed").count() == 10000)
    assert(repo.table("lay", "zed").select("x", "y").collect().toSet ==
      repo.table("lay", "sorted").select("x", "y").collect().toSet)
    // sorted on (x, y): x is tight but y spans nearly its whole domain in
    // every file; z-ordered: BOTH dimensions stay narrow per file
    val (zx, zy) = (avgRange("zed", "x"), avgRange("zed", "y"))
    val sy = avgRange("sorted", "y")
    assert(zy < sy * 0.6, s"z-order y width $zy !< 0.6 * sorted y width $sy")
    assert(zx < 60 && zy < 60, s"expected narrow boxes, got x=$zx y=$zy")
  }
}
