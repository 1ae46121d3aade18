package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale probes: run key operators at 1× and 4× the sf0.001 row count and
  * check work grows roughly linearly (wall time is too noisy in CI; we
  * assert on result sanity + shuffle-size-proxy invariants instead, and
  * that 4× completes at all without plan degeneration).
  *
  * The real scale argument lives in the plan audits (broadcasts, pruning,
  * one-shuffle LSH); this spec guards against accidental O(n²) blowups —
  * an operator that cross-joins will take minutes at 4×, failing the
  * suite's time budget. */
class ScaleProbeSpec extends SparkSpec {

  private def amplified(times: Int): DataFrame = {
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (1 until times).foldLeft(l) { (acc, i) =>
      acc.unionByName(l.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
    }
  }

  test("q1-style aggregation output is amplification-invariant per group") {
    val base = amplified(1).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = amplified(4).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(big == base.map { case (k, v) => k -> v * 4 })
  }

  test("exact dedup at 4x: dup groups scale, survivors invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val x4 = (0 until 4).map(i =>
      docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val out = operators.Dedup.exact(x4, Seq("text"), Seq(col("doc_id")))
    assert(out.count() == docs.count())
  }

  test("minhash pairs at 4x duplication: pair count scales ~quadratically in copies, not rows") {
    // 4 copies of each doc → C(4,2)=6 pairs per doc; the LSH must find
    // per-bucket structure, not explode across unrelated docs.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(100)
    val x4 = (0 until 4).map(i =>
      docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val pairs = operators.Dedup.minhashPairs(x4, "doc_id", "text",
      numHashes = 48, bands = 12, threshold = 0.9)
    val n = pairs.count()
    // exact duplicates: est_jaccard = 1 → all 6 pairs per doc survive 0.9
    assert(n >= 100 * 6 * 0.95, s"pair recall too low: $n")
    assert(n <= 100 * 6 * 1.5, s"pair explosion: $n")
  }
}
