package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed BPE merge training: kernel merge semantics, the
  * hand-computable trainer fixed point (argmax + tie-break + early
  * stop), partitioning invariance, and the replay == greedy theorem the
  * registered query's oracle leans on. */
class BpeTrainSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def mergeOf(in: Seq[String], a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(in).toDF("syms")
      .select(BpeTrain.mergeAdjacent(col("syms"), a, b).as("m"))
      .head().getSeq[String](0)
  }

  test("mergeAdjacent: left-to-right non-overlapping merge-all") {
    // even run pairs fully; odd run leaves the LAST element unmerged
    assert(mergeOf(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(mergeOf(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergeOf(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // merged output cannot chain into another merge within the same pass
    assert(mergeOf(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // no occurrence -> unchanged
    assert(mergeOf(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(mergeOf(Seq("x"), "a", "b") == Seq("x"))
  }

  private val handWords = Seq(("the", 5L), ("then", 2L), ("at", 3L))

  test("trainMerges: hand-computed argmax, tie-break, early stop") {
    import spark.implicits._
    val words = handWords.toDF("wd", "cnt")
    val res = BpeTrain.trainMerges(words, "wd", "cnt", numMerges = 8)
    // r0: (t,h)=7 ties (h,e)=7 -> lexicographic tie-break picks (h,e);
    // r1: (t,he)=7; r2: (a,t)=3; r3: (the,n)=2; r4: no pairs -> stop at 4
    assert(res.merges.map(m => (m.left, m.right, m.pairCount)) == Seq(
      ("h", "e", 7L), ("t", "he", 7L), ("a", "t", 3L), ("the", "n", 2L)))
    assert(res.merges.map(_.rank) == Seq(0, 1, 2, 3))
    // final state: every word fully merged to one token
    val total = res.finalState
      .agg(sum(col("cnt") * size(col("syms")))).head().getLong(0)
    assert(total == 10L)
    res.finalState.unpersist()
  }

  test("trainMerges is partitioning-invariant") {
    import spark.implicits._
    val words = handWords.toDF("wd", "cnt")
    val a = BpeTrain.trainMerges(words, "wd", "cnt", 8)
    val b = BpeTrain.trainMerges(words.repartition(7), "wd", "cnt", 8)
    assert(a.merges == b.merges)
    a.finalState.unpersist(); b.finalState.unpersist()
  }

  test("replay total == greedy encoder total on a randomized corpus") {
    import spark.implicits._
    // deterministic pseudo-random words (no Random: spec must be
    // rerun-stable) — Zipf-ish letter soup with repeated morphemes so
    // merges actually fire across rank levels
    val syllables = Vector("th", "er", "on", "an", "re", "he", "in",
      "ed", "nd", "ha", "at", "en", "es", "of", "or", "nt")
    val words = (1 to 400).map { i =>
      val n = 1 + (i * 2654435761L % 4).toInt
      val w = (0 until n).map(k =>
        syllables(((i * 31 + k * 17) % syllables.size).abs)).mkString
      (w, 1L + (i % 7))
    }.toDF("wd", "cnt")
    val res = BpeTrain.trainMerges(words, "wd", "cnt", numMerges = 8)
    assert(res.merges.size == 8)
    // trained tables are chain-structured by construction (operands
    // always predate the merge), hence greedy == rank-ordered replay
    val enc = res.encoder()
    assert(enc.chainStructured)
    val replay = res.finalState
      .agg(sum(col("cnt") * size(col("syms")))).head().getLong(0)
    val greedy = res.finalState
      .agg(sum(col("cnt") * Bpe.tokenCount(col("wd"), enc)))
      .head().getLong(0)
    assert(replay == greedy,
      s"training-state total $replay != greedy encode total $greedy")
    res.finalState.unpersist()
  }
}
