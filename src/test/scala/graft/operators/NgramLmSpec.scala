package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.expressions.BigramCounts

class NgramLmSpec extends graft.SparkSpec {
  import spark.implicits._

  private def bigramMap(s: String): Map[String, Long] = {
    val toks = s.trim.split("\\s+").filter(_.nonEmpty)
    toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
  }

  private def kernel(s: Option[String]): Option[Map[String, Long]] =
    Seq(s).toDF("t")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        BigramCounts(org.apache.spark.sql.graft.ColumnBridge
          .expression(col("t")))).as("m"))
      .collect().map(r => Option(r.getAs[Map[String, Long]]("m"))).head

  test("kernel matches the composed adjacent-pair build") {
    val cases = Seq(
      "a b a b", "a b", "  padded   tokens \t here\n", "single",
      "", "   \t ", "uniçode tøkens uniçode tøkens",
      "x y x y x y z")
    for (c <- cases)
      assert(kernel(Some(c)) == Some(bigramMap(c)), s"input: '$c'")
    assert(kernel(None).isEmpty)
  }

  test("kernel invariants on randomized inputs: bigram mass = tokens - 1, " +
    "keys are adjacent pairs") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "bb", "ccc", "δδ", "e", " ", "\t", "\n")
    val inputs = (1 to 200).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(""))
    for (in <- inputs) {
      val m = kernel(Some(in)).get
      val toks = in.trim.split("\\s+").filter(_.nonEmpty)
      assert(m.values.sum == math.max(0, toks.length - 1), s"'$in'")
      val adjacent = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }.toSet
      assert(m.keySet == adjacent, s"'$in'")
    }
  }

  test("result is partitioning-invariant") {
    val docs = (1L to 60L)
      .map(i => (i, s"w${i % 5} w${i % 7} w${i % 3} w${i % 5} w${i % 2}"))
    val one = NgramLm.bigramSurprisal(
      docs.toDF("id", "text").repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val many = NgramLm.bigramSurprisal(
      docs.toDF("id", "text").repartition(13), "id", "text")
      .orderBy("id").collect().toSeq
    assert(one == many)
  }

  test("hand-computed corpus: counts, surprisal, relative gate") {
    // corpus: c_bg = {a b: 2, a c: 1, a d: 1}; N = 4
    // s(a b) = len(bin 4) - len(bin 2) = 3 - 2 = 1
    // s(a c) = s(a d)    = 3 - 1 = 2
    // docs: d1 "a b" bits 1, d2 "a c" bits 2, d3 "a d" bits 2,
    //       d4 "a b" bits 1; totals tn = 4, tb = 6
    // keep iff bits·4 <= 6·1: d1/d4 (4<=6) keep, d2/d3 (8>6) drop
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"), (4L, "A B"))
      .toDF("id", "text")
    val out = NgramLm.bigramSurprisal(docs, "id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1L), (2L, 1L, 2L, 0L), (3L, 1L, 2L, 0L),
      (4L, 1L, 1L, 1L)))
  }

  test("absolute threshold mode cross-multiplies in millibits") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"), (4L, "a b"))
      .toDF("id", "text")
    // bits per bigram: d1/d4 = 1 (1000 millibits), d2/d3 = 2 (2000)
    val keep = NgramLm
      .bigramSurprisal(docs, "id", "text", thresholdMillibits = Some(1500L))
      .orderBy("id").select("keep").as[Long].collect()
    assert(keep.toSeq == Seq(1L, 0L, 0L, 1L))
    // threshold exactly at the doc mean keeps it (<=)
    val keepEq = NgramLm
      .bigramSurprisal(docs, "id", "text", thresholdMillibits = Some(2000L))
      .orderBy("id").select("keep").as[Long].collect()
    assert(keepEq.toSeq == Seq(1L, 1L, 1L, 1L))
  }

  test("documents with fewer than two tokens emit no row") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "  \t "), (4L, "two tokens"))
      .toDF("id", "text")
    val ids = NgramLm.bigramSurprisal(docs, "id", "text")
      .select("id").as[Long].collect()
    assert(ids.toSeq == Seq(4L))
  }

  test("gibberish scores above common-phrase text and is gated out") {
    // 20 docs repeat the same phrase (high bigram counts, low surprisal);
    // 2 docs are unique token salads (every bigram count 1, surprisal =
    // full context bit length)
    val common = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
    val junk = Seq((100L, "zqx wvu tsr qpo nml"),
      (101L, "kji hgf edc baz yxw"))
    val out = NgramLm.bigramSurprisal(
      (common ++ junk).toDF("id", "text"), "id", "text")
      .select("id", "sum_bits", "n_bigrams", "keep")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val junkRows = out.filter(_._1 >= 100L)
    val commonRows = out.filter(_._1 < 100L)
    // mean bits per bigram strictly higher for junk (cross-multiplied)
    for ((_, jb, jn, jkeep) <- junkRows; (_, cb, cn, _) <- commonRows.take(1)) {
      assert(jb * cn > cb * jn, s"junk $jb/$jn not above common $cb/$cn")
      assert(jkeep == 0L)
    }
    assert(commonRows.forall(_._4 == 1L))
  }

  test("reference mode: LM from the reference corpus, unseen bigrams " +
    "smooth to count 1") {
    // reference: "a b" x3, "a c" x1 -> N = 4, c(a b) = 3, c(a c) = 1
    // s(a b) = len(bin 4) - len(bin 3) = 3 - 2 = 1
    // s(a c) = 3 - 1 = 2; unseen = 3 - 1 = 2 (count-1 smoothing)
    val ref = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("id", "text")
    val target = Seq(
      (10L, "a b a b"), // 3 bigrams: a b, b a (unseen), a b -> 1+2+1 = 4
      (11L, "z q"))     // fully unseen -> 2
      .toDF("id", "text")
    val out = NgramLm.bigramSurprisal(target, "id", "text",
      reference = Some(ref))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    // totals: tn = 4, tb = 6; keep iff bits*4 <= 6*n:
    //   d10: 16 <= 18 keep; d11: 8 > 6... 2*4=8 > 6*1=6 drop
    assert(out == Seq((10L, 3L, 4L, 1L), (11L, 1L, 2L, 0L)))
    // reference docs themselves are NOT in the output
    assert(out.map(_._1).forall(_ >= 10L))
  }

  test("self mode is unchanged by the smoothing path (reference = None " +
    "≡ reference = docs themselves)") {
    val docs = (1L to 30L)
      .map(i => (i, s"w${i % 4} w${i % 6} w${i % 3} w${i % 4}"))
      .toDF("id", "text")
    val self = NgramLm.bigramSurprisal(docs, "id", "text")
      .orderBy("id").collect().toSeq
    val explicit = NgramLm.bigramSurprisal(docs, "id", "text",
      reference = Some(docs)).orderBy("id").collect().toSeq
    assert(self == explicit)
  }

  test("shuffled-hash LM path is bit-identical to the broadcast path") {
    val docs = (1L to 50L)
      .map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 5}"))
      .toDF("id", "text")
    val a = NgramLm.bigramSurprisal(docs, "id", "text", broadcastLm = true)
      .orderBy("id").collect().toSeq
    val b = NgramLm.bigramSurprisal(docs, "id", "text", broadcastLm = false)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("plan: broadcast path broadcasts the LM; text never re-shuffles") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("id", "text")
    val plan = NgramLm.bigramSurprisal(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
