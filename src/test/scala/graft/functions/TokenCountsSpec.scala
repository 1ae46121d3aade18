package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec
import graft.functions.expressions.TokenCounts

/** `explode(TokenCounts(t))` must yield exactly the row set of the
  * composed `explode(wsTokens(t)) → groupBy(id, term).count()` it
  * replaces — the tf stage of TfIdf without its corpus-wide exchange —
  * and the full TfIdf operator must be output-identical through it. */
class TokenCountsSpec extends SparkSpec {
  import spark.implicits._

  private def tokenCounts(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(c)))

  test("fused token counts equal the composed explode+groupBy on corpus " +
    "docs and edge strings") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), lower(col("text")).as("t")).limit(200)
    val edge = Seq(
      (9001L, "a a a b  b\tc"),
      (9002L, "  leading and trailing  "),
      (9003L, ""),
      (9004L, " \t\n "),
      (9005L, "héllo wörld héllo 日本語 日本語 日本語"),
      (9006L, "x")
    ).toDF("id", "t")
    val all = docs.unionByName(edge)

    val fused = all
      .select(col("id"), explode(tokenCounts(col("t"))).as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val composed = all
      .select(col("id"), explode(TextFunctions.wsTokens(col("t"))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(fused == composed)
    // empty / whitespace-only rows explode to zero rows in both forms
    assert(!fused.exists(r => r._1 == 9003L || r._1 == 9004L))

    // null text -> null map -> zero exploded rows (like exploding null)
    val nullRows = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(explode(tokenCounts(col("t"))))
      .count()
    assert(nullRows == 0L)

    // registered SQL surface
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_token_counts('a b a')['a']").head().getLong(0)
    assert(viaSql == 2L)
  }

  test("property: random whitespace/token soups count identically to the " +
    "composed pipeline") {
    val rnd = new scala.util.Random(31)
    val alphabet = "ab \t\néxyz .,!\r\f"
    val soups = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = soups.toDF("id", "t")
    val fused = df
      .select(col("id"), explode(tokenCounts(col("t"))).as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val composed = df
      .select(col("id"), explode(TextFunctions.wsTokens(col("t"))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(fused == composed)
  }

  test("TfIdf.topTerms through the fused tf stage matches the composed " +
    "groupBy pipeline end to end") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(300)
    // the pre-kernel implementation, inlined as the baseline
    val terms = docs.select(col("doc_id").as("id"),
      explode(TextFunctions.wsTokens(lower(col("text")))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("term").asc)
    val baseline = tf.join(broadcast(dfq), "term")
      .withColumn("score", col("tf") * expr("1000000 div df"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select("id", "term", "tf", "df", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

    val fused = graft.operators.TfIdf.topTerms(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(fused == baseline && fused.nonEmpty)
  }

  test("the fused tf stage carries no (id, term) exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val plan = graft.operators.TfIdf.topTerms(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    // exchanges remaining: fanOut's repartition (test-input spreading),
    // df's vocabulary aggregation, and the ranking window — but no
    // ObjectHashAggregate/HashAggregate keyed on (id, term)
    assert(!plan.contains("keys=[id#") ||
      !"""keys=\[id#\d+L?, term""".r.findFirstIn(plan).isDefined,
      s"tf must not aggregate on (id, term):\n$plan")
  }
}
