package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec
import graft.functions.expressions.{BloomShardContains, BloomShards}

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def corpus16: DataFrame =
    docs((0L until 16L).map(i => i -> s"corpus doc $i"): _*)

  test("sketch has no false negatives: every corpus hash probes true, " +
    "via the expression AND via util.sketch readFrom (format agreement)") {
    val c = corpus16
    val sketch = BloomDedup.buildSketch(c, "text", expectedItems = 16,
      numShards = 4)
    val shards = BloomDedup.loadShards(sketch)
    val probed = c.select(col("doc_id"),
      BloomDedup.mightContainText(shards, "text").as("m")).collect()
    assert(probed.forall(_.getBoolean(1)), "expression probe missed a member")

    // same answer straight through the deserialized util.sketch filters
    val hashes = c.select(xxhash64(col("text")).as("h")).as[Long].collect()
    hashes.foreach { h =>
      val s = java.lang.Math.floorMod(h, shards.numShards.toLong).toInt
      assert(shards.filters(s).mightContainLong(h))
    }
  }

  test("single-shard BloomShardContains agrees with the stock " +
    "BloomFilterMightContain on members and non-members") {
    val c = corpus16
    val sketch = BloomDedup.buildSketch(c, "text", expectedItems = 16,
      numShards = 1)
    val bytes = sketch.select(BloomDedup.SketchCol)
      .head().getAs[Array[Byte]](0)
    val shards = BloomDedup.loadShards(sketch)
    val probes = c.select(xxhash64(col("text")).as("h"))
      .unionByName(docs((100L until 140L).map(i => i -> s"absent $i"): _*)
        .select(xxhash64(col("text")).as("h")))
    val both = probes.select(
      ColumnBridge.column(BloomShardContains(
        ColumnBridge.expression(col("h")), shards)).as("mine"),
      ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(bytes)),
          ColumnBridge.expression(col("h")))).as("stock")).collect()
    both.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("dropKnownBloom output is exactly dropKnown's (content anti-join), " +
    "including a null-text batch row, across shard counts") {
    val corpus = corpus16
    val batch = docs(
      100L -> "corpus doc 3", // known — must drop
      101L -> "corpus doc 7", // known — must drop
      102L -> "genuinely new a",
      103L -> "genuinely new b")
      .unionByName(Seq((104L, Option.empty[String])).toDF("doc_id", "text"))
    val expected = Dedup.dropKnown(batch, corpus, "text")
      .select("doc_id").as[Long].collect().sorted
    assert(expected.sameElements(Array(102L, 103L, 104L)))
    for (shards <- Seq(1, 3, 8)) {
      val sketch = BloomDedup.buildSketch(corpus, "text", 16, shards)
      val got = BloomDedup.dropKnownBloom(batch, corpus, "text", sketch)
        .select("doc_id").as[Long].collect().sorted
      assert(got.sameElements(expected), s"numShards=$shards: ${got.toSeq}")
    }
  }

  test("appendToSketch folds a second ingest under the frozen geometry; " +
    "merged sketch gates against the full corpus") {
    val ingestA = corpus16
    val ingestB = docs((16L until 32L).map(i => i -> s"second wave $i"): _*)
    val full = ingestA.unionByName(ingestB)
    val sketch = BloomDedup.appendToSketch(
      BloomDedup.buildSketch(ingestA, "text", expectedItems = 32, numShards = 4),
      ingestB, "text")
    // no false negatives over EITHER ingest after the merge
    val shards = BloomDedup.loadShards(sketch)
    val miss = full.select(BloomDedup.mightContainText(shards, "text").as("m"))
      .filter(!col("m")).count()
    assert(miss == 0)
    // and the gated result matches the exact anti-join vs the full corpus
    val batch = docs(200L -> "second wave 20", 201L -> "corpus doc 1",
      202L -> "never seen")
    val got = BloomDedup.dropKnownBloom(batch, full, "text", sketch)
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(Array(202L)))
  }

  test("all-new batch with zero candidates never opens the corpus " +
    "(skipCorpusWhenClean) — corpus scan would throw") {
    val corpus = corpus16
    val sketch = BloomDedup.buildSketch(corpus, "text", 16, numShards = 2)
    val shards = BloomDedup.loadShards(sketch)
    // choose batch texts that deterministically probe false (assert it —
    // a false positive here would make the test's premise wrong, loudly)
    val batch = docs((300L until 308L).map(i => i -> s"fresh crawl $i"): _*)
    assert(batch.filter(BloomDedup.mightContainText(shards, "text")).isEmpty,
      "premise: the chosen batch must be Bloom-clean")
    val boobyTrapped = corpus16.as[(Long, String)]
      .map { _ => throw new IllegalStateException("corpus was scanned"); (0L, "") }
      .toDF("doc_id", "text")
    val kept = BloomDedup.dropKnownBloom(batch, boobyTrapped, "text", sketch)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(300L until 308L))
  }

  test("a shard no hash landed in probes as an empty filter, not an error") {
    // 1 row, many shards: most shards are driver-filled empties
    val tiny = docs(0L -> "only doc")
    val sketch = BloomDedup.buildSketch(tiny, "text", 1, numShards = 8)
    assert(sketch.count() == 8)
    val shards = BloomDedup.loadShards(sketch)
    val batch = docs(1L -> "only doc", 2L -> "another", 3L -> "third")
    val kept = BloomDedup.dropKnownBloom(batch, tiny, "text", sketch)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 3L)))
  }

  test("geometry past the session caps fails loudly and names numShards") {
    val e = intercept[IllegalArgumentException] {
      BloomDedup.buildSketch(corpus16, "text",
        expectedItems = 100000000L, numShards = 1)
    }
    assert(e.getMessage.contains("numShards"))
  }

  test("appendToSketch rejects a hole-y or inconsistent sketch table") {
    val sketch = BloomDedup.buildSketch(corpus16, "text", 16, numShards = 4)
    val holey = sketch.filter(col(BloomDedup.ShardCol) =!= 2)
    val e = intercept[IllegalArgumentException] {
      BloomDedup.appendToSketch(holey, corpus16, "text")
    }
    assert(e.getMessage.contains("must hold shards 0.."))
  }

  test("sketch binary round-trips through parquet persistence") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "sketch.parquet").getAbsolutePath
    val sketch = BloomDedup.buildSketch(corpus16, "text", 16, numShards = 4)
    sketch.write.mode("overwrite").parquet(path)
    val reloaded = BloomDedup.loadShards(spark.read.parquet(path))
    val direct = BloomDedup.loadShards(sketch)
    assert(reloaded == direct) // content-digest equality
    val miss = corpus16
      .select(BloomDedup.mightContainText(reloaded, "text").as("m"))
      .filter(!col("m")).count()
    assert(miss == 0)
  }

  test("BloomShards equality is content-based; merge-incompatible " +
    "geometries are caught by util.sketch") {
    val a = BloomDedup.buildSketch(corpus16, "text", 16, numShards = 2)
    val b = BloomDedup.buildSketch(corpus16, "text", 16, numShards = 2)
    assert(BloomDedup.loadShards(a) == BloomDedup.loadShards(b))
    val bytesA = a.orderBy(BloomDedup.ShardCol)
      .select(BloomDedup.SketchCol).head().getAs[Array[Byte]](0)
    val other = BloomDedup.buildSketch(corpus16, "text", 1600, numShards = 2)
    val bytesO = other.orderBy(BloomDedup.ShardCol)
      .select(BloomDedup.SketchCol).head().getAs[Array[Byte]](0)
    intercept[org.apache.spark.util.sketch.IncompatibleMergeException] {
      BloomFilter.readFrom(new ByteArrayInputStream(bytesA))
        .mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(bytesO)))
    }
  }
}
