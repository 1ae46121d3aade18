package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Contamination, Dedup}
import graft.sources.PqRepo

/** The integrated training-data story: every stage a real 100 TB corpus
  * pipeline runs, composed end-to-end from graft operators on the test
  * corpus — scrub → quality/repetition gate → exact dedup → near-dup
  * removal → decontamination → chunk → repo write with observed metrics.
  * Asserts each stage's contract and that the composition survives to a
  * written, readable repository table. */
class CorpusPipelineSpec extends SparkSpec {

  test("scrub → filter → dedup → decontaminate → chunk → observed write") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val n0 = docs.count()

    // 1. scrub PII, then gate on quality + repetition
    val scrubbed = docs.select(col("doc_id"),
      TextFunctions.redactPii(col("text")).as("text"))
    val gated = scrubbed
      .withColumn("q", TextFunctions.qualityScore(col("text")))
      .withColumn("rep", TextFunctions.duplicateNgramFraction(col("text"), 3))
      .filter(col("q") > 0.2 && col("rep") < 0.5)
      .select("doc_id", "text")
    val n1 = gated.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup (planted copies must vanish), then near-dup removal
    val withDups = gated.unionByName(
      gated.limit(20).select((col("doc_id") + 900000).as("doc_id"), col("text")))
    val exactDeduped = Dedup.exact(withDups, Seq("text"), Seq(col("doc_id")))
    assert(exactDeduped.count() == n1)

    val nearDeduped = Dedup.dropNearDuplicates(exactDeduped, "doc_id", "text",
      numHashes = 48, bands = 12, threshold = 0.9, verifyExact = true)
    val n2 = nearDeduped.count()
    assert(n2 == n1) // content-verified: no false removals on distinct texts

    // 3. decontaminate against a "benchmark" (first docs); contaminated
    //    docs (here: any sharing a 8-gram with the benchmark) drop out
    val bench = docs.filter(col("doc_id") < 10)
    val contaminated = Contamination.ngramOverlap(
      nearDeduped.filter(col("doc_id") >= 10), bench, "doc_id", "text", n = 8)
      .select(col("doc_id"))
    val clean = nearDeduped.filter(col("doc_id") >= 10)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val n3 = clean.count()
    assert(n3 > 0)

    // 4. chunk for training and land in the repo with observed metrics
    val chunks = clean.select(col("doc_id"),
      explode(TextFunctions.tokenChunks(col("text"), chunkSize = 64,
        overlap = 16)).as("c"))
      .select(col("doc_id"), col("c.idx"), col("c.chunk"), col("c.n_tokens"))

    val repo = PqRepo(spark, Files.createTempDirectory("graft_pipe").toString)
    val (path, metrics) = repo.writeObserved(chunks, "corpus", "chunks",
      metrics = Seq(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens").cast("long")).as("n_tokens")),
      modified = Some("x (Updated 2026-08-12)"))

    val back = repo.table("corpus", "chunks")
    assert(back.count() == metrics("n_chunks").asInstanceOf[Long])
    assert(metrics("n_tokens").asInstanceOf[Long] > 0)
    assert(back.select(countDistinct(col("doc_id"))).head().getLong(0) == n3)
    assert(path.toString.endsWith("corpus/chunks.parquet"))
  }

  test("opt-in ngram-LM gate in pipeline_curate drops exactly the " +
    "operator-flagged docs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val base = SparkEntry.pipelineCurateStaged(spark, dir, ngramLmGate = false)
      .select("doc_id").as[Long].collect().toSet
    val gatedRun = SparkEntry.pipelineCurateStaged(spark, dir, ngramLmGate = true)
      .select("doc_id").as[Long].collect().toSet
    // the gate only removes docs, never adds
    assert(gatedRun.subsetOf(base))
    assert(gatedRun.size < base.size,
      "LM gate dropped nothing — the relative cut must split the corpus")
    // every survivor of the gated pipeline must have passed the LM gate:
    // score the SAME frame the pipeline feeds the gate (lang/quality-
    // filtered originals + plants — the LM model is trained on that
    // corpus, not the raw table, so raw-corpus flags would not match).
    // The frame comes from the SHARED helper the pipeline itself uses
    // (r17 advice #4 — the hand rebuild here could silently drift).
    import graft.operators.NgramLm
    val gatedFrame = SparkEntry.curateGatedFrame(spark, dir)
    val flagged = NgramLm.bigramSurprisal(gatedFrame, "doc_id", "text")
      .filter(col("keep") === 0L).select(col("id").as[Long]).collect().toSet
    assert(gatedRun.forall(id => !flagged(id)),
      "gated output contains an LM-dropped doc")
  }

  test("LM gate passes through docs the LM never scored (r17 advice #2)") {
    import spark.implicits._
    // "ok" is a 1-token doc: no bigram, no surprisal row — the gate's
    // semantics are keep-iff-flagged-above-mean, so it must SURVIVE.
    // The repeated common-bigram docs sit below the mean (kept); the
    // rare-bigram doc sits above it (dropped) — asserting the gate still
    // actually gates around the pass-through fix.
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "the cat sat on the mat the cat sat on the mat"),
      (3L, "the cat sat on the mat the cat sat on the mat"),
      (4L, "zq xv jk wq zx qj vk xz"),
      (5L, "ok")).toDF("doc_id", "text")
    val out = SparkEntry.lmGate(docs).select($"doc_id".as[Long]).collect().toSet
    assert(out.contains(5L), "unscored 1-token doc must pass through the gate")
    assert(Set(1L, 2L, 3L).subsetOf(out), "below-mean docs must survive")
    assert(!out.contains(4L), "above-mean rare-bigram doc must be dropped")
  }
}
