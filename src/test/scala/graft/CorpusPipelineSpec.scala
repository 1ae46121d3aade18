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
}
