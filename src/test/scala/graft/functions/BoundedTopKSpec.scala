package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** [[graft.functions.expressions.BoundedTopK]] — the bounded per-group
  * top-k aggregate that replaced the rank windows in [[Similarity]].
  * Equivalence is proven against the window formulation it replaced, on
  * inputs engineered to hit every ordering edge (score ties, null scores,
  * -0.0, string ids); the plan audit pins the scale property: no Window
  * and no global Sort over the scored cross product. */
class BoundedTopKSpec extends SparkSpec {

  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "s", "rank")
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(VectorFunctions.boundedTopK(col("s"), col("id"), k).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "e")))
      .select(col("g"), col("e.id").as("id"), col("e.score").as("s"),
        (col("p") + 1).as("rank"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("matches the rank window on ties, null scores and many partitions") {
    // 40 groups × 500 rows over 32 partitions; scores quantized to force
    // ties (id tiebreak), every 97th score null (desc-nulls-last path)
    val df = spark.range(20000).repartition(32)
      .select((col("id") % 40).as("g"), col("id"),
        when(col("id") % 97 === 0, lit(null).cast("double"))
          .otherwise(round(sin(col("id").cast("double")), 1)).as("s"))
      .cache()
    try {
      assert(canon(viaAgg(df, 7)) == canon(viaWindow(df, 7)))
      // k larger than any group: keeps everything, including null scores
      assert(canon(viaAgg(df, 100000)) == canon(viaWindow(df, 100000)))
    } finally df.unpersist()
  }

  test("-0.0 and 0.0 rank as equal (id tiebreak), matching the window") {
    val df = Seq(
      (1L, 10L, 0.0), (1L, 11L, -0.0), (1L, 12L, -1.0), (1L, 13L, -0.0)
    ).toDF("g", "id", "s").repartition(4)
    assert(canon(viaAgg(df, 3)) == canon(viaWindow(df, 3)))
    // the winner set must be the three zero-scored ids by ascending id
    assert(viaAgg(df, 3).select("id").as[Long].collect().toSet == Set(10L, 11L, 13L))
  }

  test("string ids: tiebreak and serialization across the exchange") {
    val df = spark.range(3000).repartition(16)
      .select((col("id") % 5).as("g"),
        concat(lit("doc-"), lpad(col("id").cast("string"), 6, "0")).as("id"),
        (col("id") % 7).cast("double").as("s"))
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val expect = canon(df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4).select("g", "id", "s", "rank"))
    assert(canon(viaAgg(df, 4)) == expect)
  }

  test("int ids come back as ints") {
    val df = Seq((1L, 7, 2.0), (1L, 3, 2.0), (1L, 9, 5.0))
      .toDF("g", "id", "s")
    val out = viaAgg(df, 2).collect()
    assert(out.map(_.getInt(1)).toSet == Set(9, 3))
  }

  test("plan audit: topk queries carry no Window and no Sort over the " +
    "scored stream") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (plan <- Seq(
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 4).queryExecution.executedPlan.toString,
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 4, rerankDepth = 20)
        .queryExecution.executedPlan.toString)) {
      assert(!plan.contains("Window"), plan)
      assert(!plan.contains("Sort "), plan)
      assert(plan.contains("ObjectHashAggregate"), plan)
    }
  }
}
