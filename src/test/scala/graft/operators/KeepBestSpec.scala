package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quality-based representative selection: the best-scoring member of
  * each near-dup component survives (tie → lowest id), null scores
  * never displace scored members, and the policy is score-first — a
  * lower-id worse-scoring member loses. */
class KeepBestSpec extends SparkSpec {

  private val textA = "the quick brown fox jumps over the lazy dog " +
    "and keeps running far beyond the quiet river"
  private val textB = "completely different content about catalyst " +
    "optimizer internals and shuffle partition sizing"

  test("component winner by (score desc, id asc); singletons untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, textA, 0.4),   // component {1,2,3}: 2 has the best score
      (2L, textA, 0.9),
      (3L, textA, 0.9),   // ties 2 on score -> min id 2 wins
      (10L, textB, 0.1)   // singleton survives regardless of score
    ).toDF("id", "text", "score")
    val (out, stats) = Dedup.dropNearDuplicatesKeepBest(
      docs, "id", "text", "score", threshold = 1.0, verifyExact = true)
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 10L))
    assert(stats.converged)
  }

  test("lower id does NOT win against a better score (policy is " +
    "score-first, unlike dropNearDuplicates)") {
    import spark.implicits._
    val docs = Seq(
      (1L, textA, 0.2), (2L, textA, 0.8)).toDF("id", "text", "score")
    val best = Dedup.dropNearDuplicatesKeepBest(
      docs, "id", "text", "score", threshold = 1.0, verifyExact = true)
      ._1.select("id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L))
    val minId = Dedup.dropNearDuplicates(
      docs, "id", "text", threshold = 1.0, verifyExact = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L), "the id-policy twin keeps the opposite row")
  }

  test("null scores rank below every scored member") {
    import spark.implicits._
    val docs = Seq(
      (1L, textA, Some(0.1)), (2L, textA, None),
      (5L, textB, None), (6L, textB, None) // all-null group -> min id
    ).toDF("id", "text", "score")
    val out = Dedup.dropNearDuplicatesKeepBest(
      docs, "id", "text", "score", threshold = 1.0, verifyExact = true)
      ._1.select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 5L))
  }

  test("exact-only fast path (r21): ineligible rows always survive, " +
    "unverified regime groups by signature") {
    import spark.implicits._
    val docs = Seq(
      (1L, textA, 0.4), (2L, textA, 0.9),       // dup group -> 2 wins
      (7L, "abc", 0.0),                          // shorter than shingleK
      (8L, null.asInstanceOf[String], 0.0),      // null text
      (9L, textB, -5.0)                          // singleton
    ).toDF("id", "text", "score")
    for (verify <- Seq(true, false)) {
      val out = Dedup.dropNearDuplicatesKeepBest(
        docs, "id", "text", "score", threshold = 1.0, verifyExact = verify)
        ._1.select("id").collect().map(_.getLong(0)).toSet
      assert(out == Set(2L, 7L, 8L, 9L), s"verifyExact=$verify: $out")
    }
  }

  test("exact-only fast path agrees with the id-policy twin when all " +
    "scores tie (winner = min id, independent implementations)") {
    import spark.implicits._
    // a mixed corpus: several dup groups of different sizes + singletons;
    // equal scores make keep-best's policy collapse to keep-min-id, so
    // the digest fast path must reproduce dropNearDuplicates' exactGroups
    // path row for row
    val docs = (0L until 60L).map { i =>
      (i, s"document body number ${i % 7} with enough bytes to shingle", 1.0)
    }.toDF("id", "text", "score")
    val best = Dedup.dropNearDuplicatesKeepBest(
      docs, "id", "text", "score", threshold = 1.0, verifyExact = true)
      ._1.select("id").collect().map(_.getLong(0)).toSet
    val minId = Dedup.dropNearDuplicates(
      docs, "id", "text", threshold = 1.0, verifyExact = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(best == minId)
    assert(best == (0L until 7L).toSet)
  }

  test("near (non-identical) components pick the best-scoring member") {
    import spark.implicits._
    // sub-1.0 threshold: textA vs textA+" tail" are near-dups; the
    // mutated (longer) doc carries the better score and must win
    val docs = Seq(
      (1L, textA, 0.3), (2L, textA + " extra tail words", 0.7)
    ).toDF("id", "text", "score")
    val out = Dedup.dropNearDuplicatesKeepBest(
      docs, "id", "text", "score", threshold = 0.3)
      ._1.select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L))
  }
}
