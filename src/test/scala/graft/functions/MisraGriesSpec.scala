package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra–Gries frequent-items aggregate (r15): exact in the ≤ k-distinct
  * regime, bounded-error in the sketch regime, map-side combinable. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(rows: Seq[(String, String, Long)]) =
    rows.groupBy(r => (r._1, r._2)).map { case ((g, t), xs) =>
      (g, t, xs.map(_._3).sum)
    }.toSeq

  test("≤ k distinct terms per group: every counter exact, ordering " +
    "(count desc, term asc), identical across input layouts") {
    val rows = for {
      g <- Seq("a", "b")
      (t, w) <- Seq(("x", 5L), ("y", 3L), ("z", 3L), ("w", 1L))
    } yield (g, t, w * (if (g == "a") 1 else 2))
    def run(parts: Int) = rows.toDF("g", "t", "w").repartition(parts)
      .groupBy("g")
      .agg(TextFunctions.heavyHitters(col("t"), col("w"), 8).as("hh"))
      .select(col("g"), posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.term"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSet
    val one = run(1)
    assert(one == run(13), "layout-independent (merge path ≡ update path)")
    val expect = exactCounts(rows).groupBy(_._1).flatMap { case (g, xs) =>
      xs.sortBy(x => (-x._3, x._2)).zipWithIndex
        .map { case ((_, t, c), i) => (g, i, t, c) }
    }.toSet
    assert(one == expect, s"$one vs $expect")
  }

  test("sketch regime: every term heavier than W/(k+1) retained; " +
    "estimates are lower bounds within W/(k+1)") {
    val k = 8
    // zipf-ish: a few heavy terms + a long tail of singletons
    val rows: Seq[(String, String, Long)] =
      Seq(("g", "h1", 400L), ("g", "h2", 300L), ("g", "h3", 200L)) ++
        (0 until 600).map(i => ("g", s"tail$i", 1L))
    val trueCounts = exactCounts(rows).map(x => x._2 -> x._3).toMap
    val total = rows.map(_._3).sum
    val got = rows.toDF("g", "t", "w").repartition(7)
      .groupBy("g")
      .agg(TextFunctions.heavyHitters(col("t"), col("w"), k).as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("e.term"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    val bound = total / (k + 1)
    // guaranteed retention above the bound
    Seq("h1", "h2", "h3").foreach { h =>
      assert(trueCounts(h) > bound)
      assert(got.contains(h), s"heavy term $h must be retained; got $got")
    }
    // lower-bound property with bounded slack
    got.foreach { case (t, est) =>
      val truth = trueCounts(t)
      assert(est <= truth, s"$t overestimated: $est > $truth")
      assert(est >= truth - bound, s"$t short by more than W/(k+1)")
    }
  }

  test("the aggregate partial-combines map-side (no raw token shuffle)") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"),
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.expressions.TokenCounts(
            org.apache.spark.sql.graft.ColumnBridge.expression(
              lower(col("text")))))).as(Seq("term", "tf")))
      .groupBy("lang")
      .agg(TextFunctions.heavyHitters(col("term"), col("tf"), 16).as("hh"))
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_heavy_hitters"), plan)
  }
}
