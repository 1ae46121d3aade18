package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("t").select(c).head().get(0)

  test("wsTokenCount ignores extra whitespace") {
    assert(one(TextFunctions.wsTokenCount($"t"), "  a  b\tc \n d ") == 4)
    assert(one(TextFunctions.wsTokenCount($"t"), "") == 0)
  }

  test("bpeTokenCount splits words and punctuation") {
    assert(one(TextFunctions.bpeTokenCount($"t"), "ab, cd!") == 4)
  }

  test("normalizeText: lowercase, trim, collapse whitespace runs") {
    assert(one(TextFunctions.normalizeText($"t"), "  Hello\t\n  WORLD  ")
      == "hello world")
    assert(one(TextFunctions.normalizeText($"t"), "already clean")
      == "already clean")
    assert(one(TextFunctions.normalizeText($"t"), "") == "")
    // case/format variants of the same content normalize identically
    assert(one(TextFunctions.normalizeText($"t"), " A  B ")
      == one(TextFunctions.normalizeText($"t"), "a\tb"))
    // trailing TAB: trim only strips spaces, so collapse must run first
    assert(one(TextFunctions.normalizeText($"t"), "pad me\t ") == "pad me")
    assert(one(TextFunctions.normalizeText($"t"), "\tpad me") == "pad me")
  }

  test("ratios are bounded and sane") {
    val a = one(TextFunctions.alphaRatio($"t"), "ab12").asInstanceOf[Double]
    assert(a == 0.5)
    val p = one(TextFunctions.punctRatio($"t"), "a,b.").asInstanceOf[Double]
    assert(p == 0.5)
    // empty string: guarded denominator, no division error
    assert(one(TextFunctions.alphaRatio($"t"), "") == 0.0)
  }

  test("qualityScore within [0,1]") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }

  test("langId picks profile with most hits, en tie-break") {
    assert(one(TextFunctions.langId($"t"), "the cat and the dog") == "en")
    assert(one(TextFunctions.langId($"t"), "der hund und die katze ist nicht") == "de")
    assert(one(TextFunctions.langId($"t"), "xyz") == "en") // all-zero tie
  }

  test("fingerprint is deterministic rolling hash, order-sensitive") {
    val f1 = one(TextFunctions.fingerprint($"t"), "abc")
    // 'a'=97,'b'=98,'c'=99: ((97*257+98)*257+99) % 1e9+7
    assert(f1 == ((97L * 257 + 98) * 257 + 99) % 1000000007L)
    assert(one(TextFunctions.fingerprint($"t"), "acb") != f1)
    assert(one(TextFunctions.fingerprint($"t"), "") == 0L)
  }

  test("charShingles distinct sliding windows") {
    val sh = one(TextFunctions.charShingles($"t", 3), "abcabc")
      .asInstanceOf[collection.Seq[String]]
    assert(sh.toSet == Set("abc", "bca", "cab"))
    assert(one(TextFunctions.charShingles($"t", 5), "ab")
      .asInstanceOf[collection.Seq[String]].isEmpty)
  }
}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("minhash signature estimates jaccard within tolerance") {
    val k = 5
    val sigs = docs.limit(50)
      .select(col("doc_id"), TextFunctions.charShingles(col("text"), k).as("sh"))
      .select(col("doc_id"), col("sh"), MinHash.hashPairs(col("sh")).as("hp"))
      .select(col("doc_id"), col("sh"),
        MinHash.signatureFromPairs(col("hp"), 64).as("sig"))
    val pairs = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("true_j"),
        MinHash.estJaccard(col("a.sig"), col("b.sig")).as("est_j"))
    val offBy = pairs.select(avg(abs(col("true_j") - col("est_j")))).head().getDouble(0)
    assert(offBy < 0.12, s"mean |true - est| = $offBy")
  }

  test("identical docs give identical signatures; disjoint docs share no slots") {
    val df = Seq(("aaaa bbbb cccc", "aaaa bbbb cccc"), ("abcdefgh", "zyxwvuts"))
      .toDF("x", "y")
      .select(
        MinHash.signatureFromPairs(
          MinHash.hashPairs(TextFunctions.charShingles(col("x"), 4)), 32).as("sx"),
        MinHash.signatureFromPairs(
          MinHash.hashPairs(TextFunctions.charShingles(col("y"), 4)), 32).as("sy"))
      .select(MinHash.estJaccard(col("sx"), col("sy")).as("e"))
      .collect().map(_.getDouble(0))
    assert(df(0) == 1.0)
    assert(df(1) < 0.2)
  }

  test("simhash: near-identical token sets land within small hamming distance") {
    val d = Seq(
      ("a", "spark group query row data slow small filter customer line"),
      ("b", "spark group query row data slow small filter customer line extra"),
      ("c", "totally different words entirely unrelated content here now then")
    ).toDF("id", "t")
      .select(col("id"), SimHash.simhash(TextFunctions.wsTokens(col("t"))).as("sh"))
    val m = d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("a"), m("b")) <= 8)
    assert(ham(m("a"), m("c")) > 8)
  }

  test("simhash sketches are non-negative (63-bit)") {
    val neg = docs.select(SimHash.simhash(TextFunctions.wsTokens(col("text"))).as("s"))
      .filter(col("s") < 0).count()
    assert(neg == 0)
  }
}

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
      .select(round(VectorFunctions.cosine(col("a"), col("b")), 9).as("c"))
      .collect().map(_.getDouble(0))
    assert(df(0) == 1.0 && df(1) == 0.0 && df(2) == 0.0)
  }

  test("lshBucket: same vector same bucket, deterministic across runs") {
    val planes = VectorFunctions.hyperplanes(8, 4, seed = 42L)
    val planes2 = VectorFunctions.hyperplanes(8, 4, seed = 42L)
    assert(planes == planes2)
    val df = Seq(Seq(1.0f, -2.0f, 0.5f, 3.0f)).toDF("v")
      .select(VectorFunctions.lshBucket(col("v"), planes).as("b"))
    val b1 = df.head().getLong(0)
    assert(df.head().getLong(0) == b1 && b1 >= 0 && b1 < 256)
  }
}

class TokenChunksSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def chunksOf(text: String, size: Int, overlap: Int) =
    Seq(text).toDF("t")
      .select(explode(TextFunctions.tokenChunks(col("t"), size, overlap)).as("c"))
      .select("c.idx", "c.chunk", "c.n_tokens")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))

  test("short document yields exactly one chunk") {
    val out = chunksOf("a b c", 32, 8)
    assert(out.toSeq == Seq((0, "a b c", 3)))
  }

  test("chunks overlap by the configured amount and cover all tokens") {
    val words = (1 to 10).map(i => s"w$i")
    val out = chunksOf(words.mkString(" "), 4, 2)
    // ceil((10-4)/2)+1 = 4 chunks, starts 0,2,4,6 — the last is full
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(out.head._2 == "w1 w2 w3 w4")
    assert(out(1)._2 == "w3 w4 w5 w6")
    assert(out.last._2 == "w7 w8 w9 w10" && out.last._3 == 4)
    // every token appears in at least one chunk
    val covered = out.flatMap(_._2.split(" ")).toSet
    assert(covered == words.toSet)
    // an 11th token forces a short trailing chunk
    val out11 = chunksOf((words :+ "w11").mkString(" "), 4, 2)
    assert(out11.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    assert(out11.last._2 == "w9 w10 w11" && out11.last._3 == 3)
  }

  test("invalid parameters rejected") {
    assertThrows[IllegalArgumentException] {
      TextFunctions.tokenChunks(col("t"), 4, 4)
    }
  }
}
