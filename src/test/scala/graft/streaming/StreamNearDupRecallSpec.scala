package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Recall observability for the streaming near-dup operator (r17 verdict
  * #6): in the exact regime the estimate pins 1.0; in the partial
  * (lossy-LSH) regime the sampled estimate tracks the FULL-window truth
  * within ±0.05. Emitted pairs come from the batch twin
  * ([[StreamNearDup.pairsBatch]]), whose per-closed-window equivalence
  * to the stream is StreamNearDupSpec's property — the estimator itself
  * is stream-vs-batch agnostic (it consumes the collapsed output
  * frame). */
class StreamNearDupRecallSpec extends SparkSpec {

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  private val tmplA = "the quick brown fox jumps over the lazy dog and " +
    "keeps running far beyond the quiet river all afternoon while "
  private val tmplB = "completely different material about catalyst " +
    "optimizer internals shuffle sizing and partition pruning at scale "

  /** Corpus over 2 windows: per window, identical-copy groups (always
    * emitted — signatures equal) plus mutated near-dups (high Jaccard,
    * rarely banded at few bands) plus unrelated strangers. */
  private def corpus = {
    import spark.implicits._
    val docs = (0 until 2).flatMap { w =>
      val t0 = w * 3600L
      (0 until 10).flatMap { g =>
        val tmpl = if (g % 2 == 0) tmplA + g else tmplB + g
        Seq(
          (w * 1000L + g * 10L, tmpl, ts(t0 + g)),
          (w * 1000L + g * 10L + 1, tmpl, ts(t0 + 60 + g)), // identical copy
          (w * 1000L + g * 10L + 2, tmpl + " extra tail words here",
            ts(t0 + 120 + g))) // near-dup (sub-1.0 jaccard)
      }
    }
    docs.toDF("doc_id", "text", "ts")
  }

  test("exact regime (threshold 1.0, verified): recall is exactly 1.0") {
    val emitted = StreamNearDup.pairsBatch(corpus, "doc_id", "text", "ts",
      windowSeconds = 3600, shingleK = 5, numHashes = 48, bands = 12,
      threshold = 1.0, verified = true)
    val stats = StreamNearDup.recallEstimate(corpus, "doc_id", "text", "ts",
      emitted, windowSeconds = 3600, shingleK = 5, threshold = 1.0,
      sampleDocsPerWindow = 100)
    assert(stats.nWindows == 2)
    assert(stats.truthPairs > 0)
    assert(stats.recall == 1.0,
      s"exact regime must have recall 1.0, got $stats")
  }

  test("partial regime: sampled estimate within ±0.05 of full-window truth") {
    // 2 bands of 24 slots: an identical pair always collides; a mutated
    // near-dup at jaccard ~0.85 collides in a band with p ~ 0.85^24 —
    // effectively never — so the emitted set is a strict subset of truth
    val emitted = StreamNearDup.pairsBatch(corpus, "doc_id", "text", "ts",
      windowSeconds = 3600, shingleK = 5, numHashes = 48, bands = 2,
      threshold = 0.5, maxBucket = 500, verified = false)
      .select("window_start", "id_a", "id_b").distinct()

    // FULL truth: every in-window pair at exact shingle jaccard >= 0.5
    // (all docs, no sampling) — what the estimator approximates
    val base = corpus
      .filter(octet_length(col("text")) >= 5)
      .select(col("doc_id").cast("long").as("id"),
        (unix_timestamp(col("ts")) -
          pmod(unix_timestamp(col("ts")), lit(3600L))).as("ws"),
        TextFunctions.charShingles(col("text"), 5).as("sh"))
    val truthFull = base.as("a").join(base.as("b"),
        col("a.ws") === col("b.ws") && col("a.id") < col("b.id"))
      .select(col("a.ws").as("window_start"), col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        Dedup.ngramJaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.5)
      .select("window_start", "id_a", "id_b")
    val possible = truthFull.count()
    val hits = truthFull.join(emitted,
      Seq("window_start", "id_a", "id_b"), "left_semi").count()
    val fullRecall = hits.toDouble / possible
    assert(possible > 0)
    assert(fullRecall < 1.0, "partial regime must actually lose pairs")

    val stats = StreamNearDup.recallEstimate(corpus, "doc_id", "text", "ts",
      emitted, windowSeconds = 3600, shingleK = 5, threshold = 0.5,
      sampleDocsPerWindow = 20)
    assert(stats.sampledDocs < corpus.count(),
      "sample must be a strict subset for the estimate to be an estimate")
    assert(math.abs(stats.recall - fullRecall) <= 0.05,
      s"estimate ${stats.recall} vs full-window truth $fullRecall")
  }
}
