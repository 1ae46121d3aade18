package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(left: Seq[(Long, String)], right: Seq[(Long, String)],
      maxDist: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for {
      (li, ls) <- left.toSet[(Long, String)]
      (ri, rs) <- right.toSet[(Long, String)]
      dist = lev(ls, rs)
      if dist <= maxDist
    } yield (li, ri, dist)
  }

  private val names = Seq(
    1L -> "red widget", 2L -> "red widgit", 3L -> "blue bolt",
    4L -> "bluebolt", 5L -> "red", 6L -> "rd", 7L -> "", 8L -> "x")

  private def run(l: Seq[(Long, String)], r: Seq[(Long, String)], k: Int) =
    FuzzyJoin.join(l.toDF("lid", "ls"), r.toDF("rid", "rs"),
      "lid", "ls", "rid", "rs", k)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet

  test("fuzzy join at maxDist=1 equals the naive cross-product join") {
    assert(run(names, names, 1) == naive(names, names, 1))
  }

  test("fuzzy join at maxDist=2 equals the naive cross-product join") {
    assert(run(names, names, 2) == naive(names, names, 2))
  }

  test("deletion-neighborhood completeness on random word pairs") {
    // every edit type (sub/ins/del) applied to random base strings must be
    // recovered; sample the space rather than trusting the argument
    val rnd = new scala.util.Random(7)
    val bases = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString))
    val edited = bases.map { case (id, s) =>
      val p = rnd.nextInt(s.length)
      val e = rnd.nextInt(3) match {
        case 0 => s.updated(p, ('a' + rnd.nextInt(4)).toChar) // substitute
        case 1 => s.take(p) + ('a' + rnd.nextInt(4)).toChar + s.drop(p) // insert
        case _ => s.take(p) + s.drop(p + 1) // delete
      }
      (id + 1000L, e)
    }
    val got = run(bases, edited, 1)
    val want = naive(bases, edited, 1)
    assert(got == want)
    // at minimum every planted (base, edit) pair must be present
    bases.zip(edited).foreach { case ((bi, bs), (ei, es)) =>
      val d = naive(Seq((bi, bs)), Seq((ei, es)), 1)
      assert(d.isEmpty || got.exists(t => t._1 == bi && t._2 == ei))
    }
  }

  test("fuzzy join plans as a hash equi-join, never a cross product") {
    val l = names.toDF("lid", "ls")
    val r = names.toDF("rid", "rs")
    val p = FuzzyJoin.join(l, r, "lid", "ls", "rid", "rs", 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("shared join-column names work; identical id names and reserved " +
    "internal names are rejected up front") {
    // both sides call the fuzzy key 'name' — the r6 ADVICE ambiguity case
    val l = Seq(1L -> "red widget").toDF("lid", "name")
    val r = Seq(2L -> "red widgit").toDF("rid", "name")
    val out = FuzzyJoin.join(l, r, "lid", "name", "rid", "name", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 1)))
    val dup = intercept[IllegalArgumentException] {
      FuzzyJoin.join(l, r.withColumnRenamed("rid", "lid"),
        "lid", "name", "lid", "name", 1)
    }
    assert(dup.getMessage.contains("identically-named"))
    val reserved = intercept[IllegalArgumentException] {
      FuzzyJoin.join(l.withColumnRenamed("name", "__vh"), r,
        "lid", "__vh", "rid", "name", 1)
    }
    assert(reserved.getMessage.contains("reserves"))
    // an id named 'dist' would collide with the output score column
    val distId = intercept[IllegalArgumentException] {
      FuzzyJoin.join(l.withColumnRenamed("lid", "dist"), r,
        "dist", "name", "rid", "name", 1)
    }
    assert(distId.getMessage.contains("reserves"))
  }
}

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (10L, "2024-01-01", "2024-01-01"), // single day
    (11L, "2024-01-02", "2024-01-10"), // span crossing buckets
    (12L, "2024-01-08", "2024-01-12"), // overlaps 11
    (13L, "2024-03-01", "2024-03-02")  // matches nothing
  ).toDF("iid", "s", "e")
    .select(col("iid"), col("s").cast("date").as("s"), col("e").cast("date").as("e"))

  private val points = Seq(
    (1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-09"),
    (4L, "2024-01-10"), (5L, "2024-01-13"), (6L, "2024-02-15")
  ).toDF("pid", "d").select(col("pid"), col("d").cast("date").as("d"))

  private def expected: Set[(Long, Long)] = Set(
    (1L, 10L), (2L, 11L), (3L, 11L), (3L, 12L), (4L, 11L), (4L, 12L))

  test("overlapAggregate equals overlapJoin + groupBy for decomposable aggs") {
    // duplicate timestamps so the per-ts partial actually combines rows
    val pts = points.unionByName(points).withColumn("v", col("pid") * 10)
    val viaJoin = IntervalJoin.overlapJoin(pts, intervals, "d", "s", "e")
      .groupBy("iid")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (bcast <- Seq(true, false)) {
      val viaAgg = IntervalJoin.overlapAggregate(pts, intervals, "d", "s", "e",
        groupCols = Seq("iid"),
        partialAggs = Seq(count(lit(1)).as("__n"), sum("v").as("__sv")),
        finalAggs = Seq(sum("__n").as("n"), sum("__sv").as("sv")),
        broadcastIntervals = bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaAgg == viaJoin, s"broadcastIntervals=$bcast")
    }
  }

  test("overlap join matches the naive containment join across bucket widths") {
    for (b <- Seq(1, 3, 30)) {
      val got = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e", b)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bucketDays=$b")
    }
  }

  test("an input already carrying __bucket is rejected, not silently dropped") {
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(points.withColumn("__bucket", lit(1)),
        intervals, "d", "s", "e")
    }
    assert(e.getMessage.contains("__bucket"))
  }

  test("overlap join emits each matching pair exactly once") {
    val rows = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e")
      .select("pid", "iid").collect()
    assert(rows.length == expected.size)
  }

  test("overlap join plans as a hash equi-join on the bucket, no nested loop") {
    val p = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("default plan broadcasts the intervals side (BuildRight), never the points") {
    val p = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BuildRight"), p)
    assert(!p.contains("BuildLeft"), p)
  }

  test("salted shuffle fallback matches the broadcast result") {
    val got = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e",
        bucketDays = 1, broadcastIntervals = false, numSalts = 4)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("salted fallback emits each matching pair exactly once despite replication") {
    val rows = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e",
        bucketDays = 1, broadcastIntervals = false, numSalts = 4)
      .select("pid", "iid").collect()
    assert(rows.length == expected.size)
  }

  test("salted fallback does not broadcast-build from the points side") {
    val p = IntervalJoin.overlapJoin(points, intervals, "d", "s", "e",
        bucketDays = 1, broadcastIntervals = false, numSalts = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // intervals replicated per salt may still auto-broadcast at this scale,
    // but the build must never be the points side
    assert(!p.contains("BuildLeft"), p)
  }

  test("an input already carrying __salt is rejected") {
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(points.withColumn("__salt", lit(1)),
        intervals, "d", "s", "e")
    }
    assert(e.getMessage.contains("__salt"))
  }
}

class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  test("sharedSpans counts cross-document spans, not within-document repeats") {
    val eight = "a b c d e f g h"
    val docs = Seq(
      (1L, eight + " tail one"),              // shares the 8-gram with doc 2
      (2L, eight + " tail two"),
      (3L, s"$eight $eight"),                 // internal repeat only counts once
      (4L, "totally different words here spread over eight tokens now"),
      (5L, "short text")                      // < 8 tokens: absent from output
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_shared"))).toMap
    assert(!out.contains(5L))
    assert(out(4L)._2 == 0L)
    // docs 1 and 2 share the 8-token prefix span AND the "b..h tail" span
    assert(out(1L) == (3L, 2L) && out(2L) == (3L, 2L))
    // doc 3 shares only the prefix span with 1 and 2; its internal
    // duplicate span (window 9 == window 1) counts once per doc
    assert(out(3L) == (8L, 1L)) // 16 tokens, 9 windows, one repeated
  }

  test("hashed and string modes agree") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def canon(hashed: Boolean) =
      Dedup.sharedSpans(docs, "doc_id", "text", n = 5, hashed = hashed)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(canon(true) == canon(false))
    assert(canon(true).nonEmpty)
  }

  test("only span hashes shuffle, text stays out of every exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val plan = Dedup.sharedSpans(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")),
      s"text-bearing exchange in:\n$plan")
  }
}
