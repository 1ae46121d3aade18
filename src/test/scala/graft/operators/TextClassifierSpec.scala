package graft.operators

import org.apache.spark.sql.functions._

class TextClassifierSpec extends graft.SparkSpec {
  import spark.implicits._

  // train: A = "x x x y" (N=4, C(x)=3, C(y)=1), B = "z z y y"
  // (N=4, C(z)=2, C(y)=2)
  // bits_A: x = len(bin 4) - len(bin 4) = 0, y = 3 - len(bin 2) = 1,
  //         default = 3 - 1 = 2
  // bits_B: z = 3 - len(bin 3) = 1, y = 3 - len(bin 3) = 1, default = 2
  private val train = Seq(("A", 1L, "x x x y"), ("B", 2L, "z z y y"))
    .toDF("lab", "id", "text")

  private def classify(docs: Seq[(Long, String)], keepAll: Boolean = false,
      bcast: Boolean = true) =
    TextClassifier.naiveBayesTokens(train, docs.toDF("id", "text"),
      "lab", "id", "text", broadcastModel = bcast, keepAll = keepAll)

  test("hand-computed model: costs, smoothing default, tie rule") {
    val out = classify(Seq(
      (10L, "x y"),   // A: 0+1 = 1, B: 2+1 = 3 -> A, 1
      (11L, "z z"),   // A: 2+2 = 4, B: 1+1 = 2 -> B, 2
      (12L, "y"),     // A: 1, B: 1 -> tie -> A (label asc)
      (13L, "q q q")) // unseen everywhere: A: 6, B: 6 -> tie -> A
    ).orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((10L, "A", 1L), (11L, "B", 2L), (12L, "A", 1L),
      (13L, "A", 6L)))
  }

  test("keepAll emits every (doc, label) with bits and rank") {
    val all = classify(Seq((10L, "x y")), keepAll = true)
      .orderBy("id", "rank").as[(Long, String, Long, Long)].collect().toSeq
    assert(all == Seq((10L, "A", 1L, 1L), (10L, "B", 3L, 2L)))
  }

  test("planted disjoint vocabularies recover exactly under shared noise") {
    val noise = "the of and to in it is was for on"
    val tr = (1L to 40L).map { i =>
      val lab = if (i % 2 == 0) "code" else "prose"
      val sig = if (lab == "code") "brace paren semicolon lambda returns"
      else "river meadow sunrise violin lantern"
      (lab, i, s"$noise $sig $sig")
    }.toDF("lab", "id", "text")
    val docs = (100L to 120L).map { i =>
      val sig = if (i % 2 == 0) "brace lambda semicolon"
      else "meadow violin lantern"
      (i, s"$noise $sig")
    }
    val out = TextClassifier.naiveBayesTokens(tr, docs.toDF("id", "text"),
      "lab", "id", "text")
      .as[(Long, String, Long)].collect()
    assert(out.length == docs.size)
    assert(out.forall { case (id, pred, _) =>
      pred == (if (id % 2 == 0) "code" else "prose")
    }, out.mkString(","))
  }

  test("result is partitioning-invariant (training and scoring)") {
    val tr = (1L to 40L).map { i =>
      (if (i % 2 == 0) "A" else "B", i,
        s"t${i % 9} t${i % 4} t${i % 6} m${i % 2}")
    }
    val docs = (100L to 130L).map(i => (i, s"t${i % 9} m${i % 2} t${i % 5}"))
    def run(parts: Int) = TextClassifier.naiveBayesTokens(
      tr.toDF("lab", "id", "text").repartition(parts),
      docs.toDF("id", "text").repartition(parts),
      "lab", "id", "text").orderBy("id").collect().toSeq
    assert(run(1) == run(11))
  }

  test("shuffled-hash model path is bit-identical to the broadcast path") {
    val docs = Seq((10L, "x y z"), (11L, "z y q"), (12L, "x x z z"))
    assert(classify(docs, bcast = true).orderBy("id").collect().toSeq ==
      classify(docs, bcast = false).orderBy("id").collect().toSeq)
  }

  test("tokenless docs emit no row; null training labels are ignored") {
    val tr = Seq(("A", 1L, "x x"), (null.asInstanceOf[String], 2L, "z z"))
      .toDF("lab", "id", "text")
    val out = TextClassifier.naiveBayesTokens(tr,
      Seq((10L, "x"), (11L, ""), (12L, "  ")).toDF("id", "text"),
      "lab", "id", "text").as[(Long, String, Long)].collect().toSeq
    // only the null-label class is dropped, so everything predicts A;
    // empty/whitespace docs vanish
    assert(out == Seq((10L, "A", 0L)))
  }

  test("registered-query shape recovers the planted lang markers on the " +
    "real corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        concat(col("text"),
          repeat(concat(lit(" xm_"), col("lang")), 12)).as("text"))
    val pred = TextClassifier.naiveBayesTokens(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "lang", "doc_id", "text")
    val joined = pred.join(
      d.select(col("doc_id").as("id"), col("lang")), "id")
    val (n, correct) = joined
      .agg(count(lit(1)), sum(when(col("pred") === col("lang"), 1L)
        .otherwise(0L)))
      .as[(Long, Long)].head()
    assert(n == 250L, s"expected 250 scored docs, got $n")
    assert(correct >= (n * 95) / 100,
      s"accuracy ${correct}/$n below 95% — the planted 12-rep marker " +
        "must dominate the shared-vocabulary quantization noise")
  }
}
