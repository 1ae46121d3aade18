package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val enc = Bpe.planted

  private def ids(s: String): Seq[Int] =
    enc.encodeArray(UTF8String.fromString(s)).toIntArray().toSeq

  test("greedy merge loop on known words (byte ids 0-255, merge r = 256+r)") {
    assert(ids("the") == Seq(257))
    assert(ids("them") == Seq(257, 'm'.toInt))
    assert(ids("thing") == Seq(256, 259))          // th + ing
    assert(ids("nation") == Seq('n'.toInt, 'a'.toInt, 264, 263)) // n a ti on
    // (o,n) rank 7 beats (t,i) rank 8 inside "tion": dynamic order is
    // ti|on (2 tokens), NOT tio|n — pins the min-rank-first loop
    assert(ids("tion") == Seq(264, 263))
    assert(ids("and") == Seq(261))
    assert(ids("z") == Seq('z'.toInt))
  }

  test("letters pretokenizer: non-letter bytes are single tokens") {
    assert(ids("the cat!") ==
      Seq(257, ' '.toInt, 'c'.toInt, 'a'.toInt, 't'.toInt, '!'.toInt))
    assert(enc.count(UTF8String.fromString("the cat!")) == 6L)
    assert(enc.count(UTF8String.fromString("")) == 0L)
    // non-ASCII passes through as raw UTF-8 bytes (byte-level: no OOV)
    assert(enc.count(UTF8String.fromString("é")) == 2L)
  }

  test("rank-ordered exhaustive replay == dynamic greedy loop on random " +
    "text (the property the SQL oracle depends on; holds because the " +
    "planted table is chain-structured)") {
    assert(enc.chainStructured)
    // reference replay: rank-by-rank exhaustive merging over symbol lists
    def replay(word: String): Seq[String] = {
      var syms = word.map(_.toString).toVector
      Bpe.PlantedMerges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    val rnd = new scala.util.Random(41)
    val alpha = "theinganderoticds "
    (1 to 300).foreach { _ =>
      val s = (1 to (1 + rnd.nextInt(24)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val viaReplay = s.split(" ", -1).filter(_.nonEmpty)
        .flatMap(replay).toSeq
      val spaces = s.count(_ == ' ')
      assert(enc.count(UTF8String.fromString(s)) ==
        (viaReplay.length + spaces).toLong, s"text '$s'")
    }
  }

  test("a non-chain merge table is detected (oracle replay would diverge)") {
    val bad = new BpeEncoder(IndexedSeq(("ab", "c"), ("a", "b")),
      Bpe.PretokenLetters)
    assert(!bad.chainStructured)
  }

  test("gpt2 pretokenizer keeps leading spaces on words and merges within") {
    val g = new BpeEncoder(Bpe.PlantedMerges, Bpe.PretokenGpt2)
    // " the" is ONE pretoken (space-prefixed letters): space byte, then
    // t+h+e merges to 'the' -> 2 tokens
    assert(g.count(UTF8String.fromString(" the")) == 2L)
    // pretokens: "don" (d|on = 2), "'t" (2), " stop" (no merges = 5)
    assert(g.count(UTF8String.fromString("don't stop")) == 9L)
  }

  test("tokenCountsMap sums to count and keys reconstruct bytes") {
    val m = enc.countsMap(UTF8String.fromString("the the cat"))
    val kv = (0 until m.numElements()).map { i =>
      m.keyArray().getUTF8String(i).toString ->
        m.valueArray().getLong(i)
    }.toMap
    assert(kv("the") == 2L)
    assert(kv(" ") == 2L)
    assert(kv.values.sum == enc.count(UTF8String.fromString("the the cat")))
  }

  test("tokenChunks partitions bytes exactly: overlap-0 chunks concat " +
    "back to the input; sizes and counts agree") {
    val docs = Seq((1L, "the thing and the nation of things"),
      (2L, "x")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      Bpe.tokenChunks(col("text"), enc, 5, 0).as("ch"))
    val rows = out.as[(Long, Seq[(Int, String, Int)])].collect().toMap
    rows.foreach { case (id, chunks) =>
      val orig = if (id == 1L) "the thing and the nation of things" else "x"
      assert(chunks.map(_._2).mkString == orig)
      assert(chunks.map(_._3).sum == enc.count(UTF8String.fromString(orig)))
      assert(chunks.init.forall(_._3 == 5))
      assert(chunks.map(_._1) == chunks.indices.map(identity))
    }
    // overlapping chunks: token windows step by chunkSize-overlap
    val ov = docs.filter($"doc_id" === 1L).select(
      Bpe.tokenChunks(col("text"), enc, 6, 2).as("ch"))
      .as[Seq[(Int, String, Int)]].head()
    assert(ov.init.forall(_._3 == 6))
  }

  test("fromMerges builds the same encoder from a merges DataFrame " +
    "(vocab-as-data ingestion)") {
    val df = Bpe.PlantedMerges.zipWithIndex
      .map { case ((a, b), r) => (a, b, r) }
      .toDF("left", "right", "rank")
      .orderBy(rand(7)) // rank column, not row order, must drive ranks
    val e2 = Bpe.fromMerges(df, pretoken = Bpe.PretokenLetters)
    val probe = UTF8String.fromString("the nation is thinking and running")
    assert(e2.count(probe) == enc.count(probe))
    assert(e2.encodeArray(probe).toIntArray().toSeq == ids(probe.toString))
  }

  test("Column API: count == size(encode); expressions stay inside " +
    "whole-stage codegen") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val both = docs.select(
      Bpe.tokenCount(col("text"), enc).as("n"),
      size(Bpe.encode(col("text"), enc)).cast("long").as("m"))
    assert(both.filter(col("n") =!= col("m")).count() == 0)
    // the "*(1)" prefix marks the Project as inside a WholeStageCodegen
    // stage — the encoder call is codegen'd, not a CodegenFallback
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("pathological million-letter word stays bounded (sliced encode)") {
    val big = UTF8String.fromString("a" * 1000000)
    val t0 = System.nanoTime()
    assert(enc.count(big) == 1000000L) // no (a,a) merge: 1 token per byte
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
  }
}
