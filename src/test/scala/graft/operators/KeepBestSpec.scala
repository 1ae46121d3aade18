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
