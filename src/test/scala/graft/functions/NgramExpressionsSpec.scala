package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The native n-gram kernels must match the composed Column forms exactly:
  * same distinct sets in the same (first-occurrence) order, same fractions
  * bit-for-bit — on corpus text, repetitive text, and edge strings. */
class NgramExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def texts = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
      .select(col("text").as("t"))
    val edge = Seq(
      "", "one", "one two", "a a a a a a", "x y x y x y x",
      "  leading and   irregular\tspacing\nhere  ",
      "héllo wörld héllo wörld tokens múltibyte").toDF("t")
    docs.unionByName(edge)
  }

  test("WordNgrams equals the composed form (order included)") {
    for (n <- Seq(2, 3, 5)) {
      val out = texts.select(
        Dedup.wordNgrams(col("t"), n).as("fused"),
        Dedup.wordNgramsComposed(col("t"), n).as("composed"))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n fused=${r.getSeq[String](0)} composed=${r.getSeq[String](1)}")
      }
    }
  }

  test("DuplicateNgramFraction equals the composed form bit-for-bit") {
    for (n <- Seq(2, 3)) {
      val out = texts.select(
        TextFunctions.duplicateNgramFraction(col("t"), n).as("fused"),
        TextFunctions.duplicateNgramFractionComposed(col("t"), n).as("composed"))
        .collect()
      out.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    }
  }

  test("known values: all-same tokens, alternating pattern") {
    val out = Seq("spam spam spam spam spam spam spam spam")
      .toDF("t")
      .select(TextFunctions.duplicateNgramFraction(col("t"), 2).as("d"))
      .head().getDouble(0)
    assert(math.abs(out - (1.0 - 1.0 / 7.0)) < 1e-15)

    val grams = Seq("x y x y").toDF("t")
      .select(Dedup.wordNgrams(col("t"), 2).as("g"))
      .head().getSeq[String](0)
    assert(grams == Seq("x y", "y x")) // first-occurrence order
  }
}

class SqlFunctionRegistrationSpec extends SparkSpec {
  test("all native kernels register as SQL functions") {
    graft.GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
      .createOrReplaceTempView("sqlreg_docs")
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20)
      .createOrReplaceTempView("sqlreg_emb")

    val text = spark.sql("""
      SELECT graft_fingerprint(text) AS fp,
             graft_word_ngrams(text, 3) AS g,
             graft_dup_ngram_fraction(text, 2) AS d,
             graft_simhash64(text) AS sh,
             graft_minhash_signature(text, 5, 16) AS sig
      FROM sqlreg_docs""").collect()
    assert(text.length == 20)
    assert(text.forall(r => !r.isNullAt(0) && !r.isNullAt(3) &&
      r.getSeq[Long](4).length == 16))

    val cos = spark.sql("""
      SELECT graft_cosine(a.embedding, b.embedding) AS c
      FROM sqlreg_emb a JOIN sqlreg_emb b ON a.vec_id < b.vec_id""").collect()
    assert(cos.nonEmpty && cos.forall(r => math.abs(r.getDouble(0)) <= 1.0))
  }
}

class RebasedFingerprintSqlSpec extends graft.SparkSpec {
  import spark.implicits._

  test("graft_fingerprint(text, base, mod) re-bases the SQL function") {
    graft.GraftExtensions.register(spark)
    Seq("hello", "", "tok7").toDF("s").createOrReplaceTempView("fp_in")
    val out = spark.sql(
      """SELECT graft_fingerprint(s) AS d,
               graft_fingerprint(s, 257, 1000000007) AS explicit,
               graft_fingerprint(s, 131, 1000000009) AS rebased
         FROM fp_in""").collect()
    // explicit default args == 1-arg form; re-based differs on non-trivial input
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
    assert(out.exists(r => r.getLong(0) != r.getLong(2)))
    // and the re-based SQL form matches the Column-API kernel
    val viaColumn = Seq("hello", "", "tok7").toDF("s")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.expressions.RollingFingerprint(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            org.apache.spark.sql.functions.col("s")),
          base = 131L, mod = 1000000009L)))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = spark.sql(
      "SELECT graft_fingerprint(s, 131, 1000000009) FROM fp_in")
      .collect().map(_.getLong(0)).toSeq
    assert(viaColumn == viaSql)
  }
}
