package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.{GraftExtensions, SparkSpec}
import graft.functions.expressions.MinHashSignature

class MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def sigCol(c: org.apache.spark.sql.Column, k: Int, n: Int) =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), k, n))

  test("produces n-slot signatures; null for short/null input") {
    val out = Seq("hello world document", "ab", null)
      .toDF("t")
      .select(sigCol($"t", 5, 16).as("sig"))
      .collect()
    assert(out(0).getSeq[Long](0).length == 16)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("identical text → identical signature; deterministic") {
    val rows = Seq("the same text body", "the same text body")
      .toDF("t").select(sigCol($"t", 5, 32).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
  }

  test("near-duplicate text shares most slots; unrelated text does not") {
    val base = "spark group query row data slow small filter customer line the batch"
    val near = base + " tail"
    val far = "zzz qqq completely unrelated pppp mmmm nnnn xxxxx yyyyy wwwww kkkkk"
    val sigs = Seq(base, near, far).toDF("t")
      .select(sigCol($"t", 5, 64).as("sig")).collect().map(_.getSeq[Long](0))
    def agree(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y } / 64.0
    assert(agree(sigs(0), sigs(1)) > 0.7, s"near agreement ${agree(sigs(0), sigs(1))}")
    assert(agree(sigs(0), sigs(2)) < 0.2, s"far agreement ${agree(sigs(0), sigs(2))}")
  }

  test("incremental lane loop equals the closed-form (a + j*b) mod 2^45 " +
    "family slot by slot") {
    // recompute the signature from the documented closed form with the
    // same window hashes — pins the kernel's add-and-mask stride to the
    // arithmetic the oracle-facing docs promise
    val M = 1L << 45
    def closedForm(s: String, k: Int, n: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8")
      val windows = bytes.length - k + 1
      val sig = Array.fill(n)(Long.MaxValue)
      for (i <- 0 until windows) {
        val h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
        val h2 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, k, 1337L)
        val a = ((h1 % M) + M) % M
        val b = (((h2 % M) + M) % M) | 1L
        for (j <- 0 until n) {
          val h = (a + j * b) % M
          if (h < sig(j)) sig(j) = h
        }
      }
      sig.toSeq
    }
    val rnd = new scala.util.Random(17)
    val texts = Seq("hello world document body", "abcde") ++
      Seq.fill(50)(Seq.fill(20 + rnd.nextInt(100))(
        (32 + rnd.nextInt(95)).toChar).mkString)
    texts.foreach { t =>
      val kernel = MinHashSignature.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 5, 64)
        .toLongArray().toSeq
      assert(kernel == closedForm(t, 5, 64), s"mismatch for: $t")
    }
  }

  test("interpreted eval and codegen agree") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val viaCodegen = df.select(col("doc_id"), sigCol(col("text"), 5, 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // force interpreted path through the expression's eval
    val exprs = df.select(col("doc_id"), col("text")).collect().map { r =>
      val a = MinHashSignature.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)), 5, 32)
      r.getLong(0) -> a.toLongArray().toSeq
    }.toMap
    assert(viaCodegen == exprs)
  }

  test("registers as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(5)
      .createOrReplaceTempView("mh_docs")
    val n = spark.sql(
      "SELECT size(graft_minhash_signature(text, 5, 24)) AS s FROM mh_docs")
      .collect().map(_.getInt(0))
    assert(n.forall(_ == 24))
    // non-literal k rejected
    assertThrows[Exception] {
      spark.sql("SELECT graft_minhash_signature(text, doc_id, 24) FROM mh_docs")
        .collect()
    }
  }

  test("stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(sigCol(col("text"), 5, 16).as("sig"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages; the projection with
    // the expression must carry one
    assert(raw"\*\(\d+\) Project".r.findFirstIn(p).isDefined, p)
  }
}

class SimHash64Spec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.functions.expressions.SimHash64

  private def nativeCol(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  test("native kernel equals the composed Column pipeline on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val both = docs.select(
      nativeCol(col("text")).as("native"),
      SimHash.simhash(TextFunctions.wsTokens(col("text"))).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("edge cases: null, empty, whitespace-only") {
    import spark.implicits._
    val out = Seq[String](null, "", "   \t\n  ", "one")
      .toDF("t").select(nativeCol($"t").as("s")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) == 0L)
    assert(out(2).getLong(0) == 0L)
    assert(out(3).getLong(0) >= 0L)
  }

  test("registered as graft_simhash64 SQL function") {
    graft.GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(3)
      .createOrReplaceTempView("sh_docs")
    val vals = spark.sql("SELECT graft_simhash64(text) AS s FROM sh_docs")
      .collect().map(_.getLong(0))
    assert(vals.forall(_ >= 0L))
  }
}
