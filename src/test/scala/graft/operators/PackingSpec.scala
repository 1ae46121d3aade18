package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"),
      graft.functions.TextFunctions.wsTokenCount(col("text"))
        .cast("long").as("tok"))

  test("packSequences: budget never exceeded, bins contiguous, greedy order") {
    val out = Packing.packSequences(docs, "doc_id", "tok",
      budget = 90L, numShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.length == docs.count())
    // oversize quarantine only for tok > budget
    out.foreach { case (_, _, bin, tok) =>
      if (tok > 90L) assert(bin == -1L) else assert(bin >= 0L)
    }
    val byBin = out.filter(_._3 >= 0).groupBy(x => (x._2, x._3))
    byBin.values.foreach(g => assert(g.map(_._4).sum <= 90L))
    // per shard: bins are contiguous 0..max and id-ordered (a later doc
    // never lands in an earlier bin)
    out.filter(_._3 >= 0).groupBy(_._2).values.foreach { g =>
      val bins = g.map(_._3).distinct.sorted.toSeq
      assert(bins == (0L to bins.max), bins.toString)
      val ordered = g.sortBy(_._1).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
    // greedy tightness: consecutive same-shard bins close only on overflow —
    // adding the first item of bin k+1 to bin k would have exceeded budget
    out.filter(_._3 >= 0).groupBy(_._2).values.foreach { g =>
      val ordered = g.sortBy(_._1)
      val fills = ordered.groupBy(_._3).map { case (b, xs) => b -> xs.map(_._4).sum }
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        if (b._3 == a._3 + 1) assert(fills(a._3) + b._4 > 90L)
      }
    }
  }

  test("packSequences: null token counts quarantine to bin -1 without disturbing the fill") {
    // id order: 1(50) -> bin 0 (fill 50); 2(null) -> -1, fill untouched;
    // 3(45): 50+45 > 90 -> bin 1 (fill 45); 4(40): 45+40 <= 90 -> bin 1
    val items = Seq((1L, Some(50L)), (2L, Option.empty[Long]),
      (3L, Some(45L)), (4L, Some(40L))).toDF("id", "tok")
    val bins = Packing.packSequences(items, "id", "tok", budget = 90L,
      numShards = 1, shardExpr = Some(lit(0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bins == Map(1L -> 0L, 2L -> -1L, 3L -> 1L, 4L -> 1L), bins.toString)
  }

  test("packSequences: a NULL-evaluating shardExpr fails loudly, naming the id") {
    // r12 advice fix: pmod over a null id used to NPE inside groupByKey
    // with no hint which input row was at fault
    val items = Seq((Some(1L), 50L), (Option.empty[Long], 30L))
      .toDF("id", "tok")
    val e = intercept[Exception] {
      Packing.packSequences(items, "id", "tok", budget = 90L,
        numShards = 4, shardExpr = Some(pmod(col("id"), lit(4)))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.contains("shardExpr evaluated to NULL")), e.toString)
  }

  test("packSequences: deterministic across re-runs; modulo and hash shards both partition all items") {
    val hash1 = Packing.packSequences(docs, "doc_id", "tok", 90L, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val hash2 = Packing.packSequences(docs, "doc_id", "tok", 90L, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(hash1 == hash2)
    assert(hash1.map(_._1).size == docs.count())
  }

  test("mixSources: bottleneck keeps all rows, others downsample toward the ratio, deterministic") {
    val d = spark.range(0, 3000).toDF("id")
    val srcs = Seq(
      Mixing.SourceSpec("a", d.filter($"id" % 3 === 0), 5),
      Mixing.SourceSpec("b", d.filter($"id" % 3 === 1), 3),
      Mixing.SourceSpec("c", d.filter($"id" % 3 === 2), 2))
    val out = Mixing.mixSources(srcs, "id", numShards = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySrc = out.groupBy(_._1).map { case (k, v) => k -> v.length }
    // equal inputs (1000 each) at 5:3:2 -> bottleneck is "a" (largest
    // weight per row): keeps all 1000; b targets 600, c targets 400
    assert(bySrc("a") == 1000, bySrc.toString)
    assert(math.abs(bySrc("b") - 600) < 60, bySrc.toString)
    assert(math.abs(bySrc("c") - 400) < 50, bySrc.toString)
    // deterministic
    val again = Mixing.mixSources(srcs, "id", numShards = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == again.toSet)
    // shards cover 0..3
    assert(out.map(_._3).toSet.subsetOf((0 until 4).toSet))
  }

  test("packStats: per-shard bins/quarantine/utilization from the packed output") {
    // shard 0: 50 -> bin 0; null -> -1; 45 -> bin 1; 40 -> bin 1
    //   bins=2, packed=3, quarantined=1, packed_tokens=135, util=135/180
    // shard 1: 95 (oversize) -> -1 only: bins=0, util=0
    val items = Seq(
      (1L, Some(50L), 0), (2L, Option.empty[Long], 0),
      (3L, Some(45L), 0), (4L, Some(40L), 0),
      (5L, Some(95L), 1)).toDF("id", "tok", "sh")
    val packed = Packing.packSequences(items, "id", "tok", budget = 90L,
      numShards = 2, shardExpr = Some(col("sh")))
    val stats = Packing.packStats(packed, budget = 90L).collect()
      .map(r => r.getInt(0) -> r).toMap
    val s0 = stats(0)
    assert(s0.getLong(1) == 2 && s0.getLong(2) == 3 && s0.getLong(3) == 1)
    assert(s0.getLong(4) == 135 && s0.getLong(5) == 0)
    assert(math.abs(s0.getDouble(6) - 0.75) < 1e-9)
    val s1 = stats(1)
    assert(s1.getLong(1) == 0 && s1.getLong(2) == 0 && s1.getLong(3) == 1)
    assert(s1.getLong(4) == 0 && s1.getLong(5) == 95)
    assert(s1.getDouble(6) == 0.0)
  }

  test("mixSourcesWithStats reports the achieved composition the bounds imply") {
    val d = spark.range(0, 3000).toDF("id")
    val srcs = Seq(
      Mixing.SourceSpec("a", d.filter($"id" % 3 === 0), 5),
      Mixing.SourceSpec("b", d.filter($"id" % 3 === 1), 3),
      Mixing.SourceSpec("c", d.filter($"id" % 3 === 2), 2))
    val g = 1000L
    // modulo sample over dense ids: the hash-slice estimate is EXACT, so
    // the reported keptEstimate must equal the materialized counts
    val (df, stats) = Mixing.mixSourcesWithStats(srcs, "id", numShards = 4,
      granularity = g,
      sampleExpr = (_, _, id) => Some(pmod(id / 3, lit(g))))
    val byTag = stats.map(s => s.tag -> s).toMap
    assert(byTag("a").bottleneck && !byTag("b").bottleneck && !byTag("c").bottleneck)
    assert(stats.forall(_.n == 1000))
    assert(byTag("a").bound == g && byTag("a").keptEstimate == 1000)
    assert(byTag("b").bound == 600 && byTag("c").bound == 400)
    assert(byTag("b").targetShare == 0.3 && byTag("c").targetShare == 0.2)
    val actual = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stats.foreach { s => assert(actual(s.tag) == s.keptEstimate,
      s"$s vs actual ${actual(s.tag)}") }
    val shares = stats.map(s => s.tag -> s.achievedShareEstimate).toMap
    assert(math.abs(shares("a") - 0.5) < 1e-9 &&
      math.abs(shares("b") - 0.3) < 1e-9 && math.abs(shares("c") - 0.2) < 1e-9,
      shares.toString)
  }

  test("mixSources epochs: up-sampled copies are deterministic across layouts and shard counts") {
    val d = spark.range(0, 2000).toDF("id")
    def srcs(big: org.apache.spark.sql.DataFrame) = Seq(
      Mixing.SourceSpec("wiki", d.filter($"id" < 400), 3, epochs = 3),
      Mixing.SourceSpec("web", big, 2))
    val base = d.filter($"id" >= 400)
    // copy e of a row survives purely as f(tag, e, id): the kept
    // (source, id, epoch) set must be identical under a different input
    // partitioning AND a different shard count
    val a = Mixing.mixSources(srcs(base), "id", numShards = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val b = Mixing.mixSources(srcs(base.repartition(13)), "id", numShards = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    // epochs enter the bound math as n·e: wiki has 400·3=1200 effective
    // rows at weight 3 (key 400), web 1600 at weight 2 (key 800) -> wiki
    // is the bottleneck and keeps ALL 1200 copies; web targets
    // floor(g·1200·2/(3·1600)) = g/2 of its rows
    val wiki = a.filter(_._1 == "wiki")
    assert(wiki.size == 1200, wiki.size.toString)
    assert(wiki.map(_._3) == Set(0, 1, 2))
    // every id appears in every epoch for the bottleneck
    assert(wiki.groupBy(_._3).values.forall(_.size == 400))
    val web = a.filter(_._1 == "web")
    assert(web.forall(_._3 == 0))
    assert(math.abs(web.size - 800) < 80, web.size.toString)
  }

  test("mixSources fails loudly on an empty source instead of shipping zero rows") {
    val d = spark.range(0, 100).toDF("id")
    val srcs = Seq(
      Mixing.SourceSpec("a", d, 1),
      Mixing.SourceSpec("b", d.filter($"id" < 0), 1))
    val e = intercept[IllegalArgumentException] {
      Mixing.mixSources(srcs, "id", numShards = 2)
    }
    assert(e.getMessage.contains("empty source"), e.getMessage)
  }

  test("mixSources: integer bound arithmetic matches the closed form") {
    val d = spark.range(0, 1200).toDF("id")
    val srcs = Seq(
      Mixing.SourceSpec("x", d.filter($"id" < 200), 1),   // n=200, w=1
      Mixing.SourceSpec("y", d.filter($"id" >= 200), 1))  // n=1000, w=1
    // bottleneck x (n/w = 200): y keeps floor(g*200*1/(1*1000)) = g/5
    val out = Mixing.mixSources(srcs, "id", numShards = 2,
      granularity = 1000L,
      sampleExpr = (_, _, id) => Some(pmod(id, lit(1000))))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "x") == 200)
    // id in [200, 1200): id % 1000 < 200 -> ids 200..199? i.e. 1000..1199
    assert(out.count(_._1 == "y") == 200)
  }
}
