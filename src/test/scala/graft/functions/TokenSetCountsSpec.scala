package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused token-set-count kernel must be bit-identical to the composed
  * tokenize/filter passes it replaces — the lang_id / text_quality oracles
  * recompute those counts in SQL. */
class TokenSetCountsSpec extends SparkSpec {
  import spark.implicits._

  private val strs = Seq(
    "The quick brown fox and the lazy dog",
    "el que la los es una",
    "  leading   and\ttrailing\nwhitespace of all kinds\r\n",
    "",
    "   ",
    "UPPER The THE tHe",
    "punctuation, the. and; of!",
    "der die das und ist nicht mit ein",
    "no matches whatsoever here xyzzy",
    "the the the the the the",
    "unicode café über straße the"
  )

  test("kernel counts equal the composed size(filter(wsTokens(lower))) " +
    "per set, and total equals size(wsTokens) lowered or not") {
    val sets = TextFunctions.LangProfiles.map(_._2) :+ TextFunctions.StopwordsEn
    val df = strs.toDF("s")
    val counts = TextFunctions.tokenSetCounts(col("s"), sets).as("k")
    val composedCols = sets.zipWithIndex.map { case (words, i) =>
      size(filter(TextFunctions.wsTokens(lower(col("s"))),
        t => t.isin(words.map(lit): _*))).as(s"c$i")
    }
    val out = df.select(
      (counts +: element_at(col("k"), 1).as("total") +:
        size(TextFunctions.wsTokens(col("s"))).as("totalRaw") +:
        size(TextFunctions.wsTokens(lower(col("s")))).as("totalLow") +:
        composedCols): _*)
      .collect()
    out.foreach { r =>
      val k = r.getSeq[Int](0)
      assert(k.head == r.getInt(2) && k.head == r.getInt(3),
        s"total mismatch: $r")
      sets.indices.foreach { i =>
        assert(k(i + 1) == r.getInt(4 + i), s"set $i mismatch: $r")
      }
    }
  }

  test("null input yields null, matching the composed null propagation") {
    val df = Seq(Option.empty[String]).toDF("s")
    val r = df.select(
      TextFunctions.tokenSetCounts(col("s"), Seq(Seq("the"))).as("k"),
      size(filter(TextFunctions.wsTokens(lower(col("s"))),
        t => t.isin(lit("the")))).as("c")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("fused langId and qualityScore are bit-identical to the composed " +
    "forms on corpus documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(300)
    val out = docs.select(
      TextFunctions.langId(col("text")).as("l"),
      TextFunctions.langIdComposed(col("text")).as("lc"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.qualityScoreComposed(col("text")).as("qc"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }
}
