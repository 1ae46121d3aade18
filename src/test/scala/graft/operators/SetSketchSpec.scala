package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SetSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sigs(rows: Seq[(String, String)], n: Int) =
    SetSketch.groupMinhash(rows.toDF("g", "item"), "g", "item", n)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("identical item sets produce identical signatures; duplicates are " +
    "irrelevant; disjoint sets differ") {
    val a = Seq("x", "y", "z").map("a" -> _)
    val b = Seq("x", "y", "z", "z", "y").map("b" -> _) // same set, with dups
    val c = Seq("p", "q", "r").map("c" -> _)
    val s = sigs(a ++ b ++ c, 32)
    assert(s("a") == s("b"))
    assert(s("a") != s("c"))
    assert(s("a").length == 32)
  }

  test("signature agreement estimates Jaccard within MinHash tolerance") {
    val rnd = new scala.util.Random(5)
    val universe = Seq.tabulate(400)(i => s"tok$i")
    val setA = universe.take(300).toSet
    val setB = universe.drop(100).toSet // |A ∩ B| = 200, |A ∪ B| = 400
    val exact = 200.0 / 400.0
    val rows = setA.toSeq.map("a" -> _) ++ setB.toSeq.map("b" -> _) ++
      Seq.fill(1)(rnd.nextInt).map(_ => "c" -> "solo") // unrelated group
    val s = sigs(rows, 128)
    val est = s("a").zip(s("b")).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
  }

  test("signaturePairs counts agreements over sketch rows only") {
    val rows = Seq("x", "y").map("a" -> _) ++ Seq("x", "y").map("b" -> _) ++
      Seq("q").map("c" -> _)
    val pairs = SetSketch.signaturePairs(
      SetSketch.groupMinhash(rows.toDF("g", "item"), "g", "item", 16), "g")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs.exists(p => p._1 == "a" && p._2 == "b" && p._3 == 16L))
    assert(pairs.size == 3) // (a,b) (a,c) (b,c)
  }

  test("bandedSignaturePairs: identical sets pair at full agreement, " +
    "near sets surface through a shared band, disjoint sets don't pair") {
    val rnd = new scala.util.Random(11)
    val universe = Seq.tabulate(300)(i => s"tok$i")
    // a == b (identical), c ~ a (90% overlap), d disjoint
    val rows = universe.take(200).map("a" -> _) ++
      universe.take(200).map("b" -> _) ++
      (universe.take(180) ++ universe.slice(200, 220)).map("c" -> _) ++
      Seq.tabulate(50)(i => "d" -> s"other$i") ++
      Seq.fill(1)(rnd.nextInt).map(_ => "e" -> "solo")
    val sigs = SetSketch.groupMinhash(rows.toDF("g", "item"), "g", "item", 32)
    val pairs = SetSketch.bandedSignaturePairs(sigs, "g", 32, bands = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("a", "b")) == 32L, s"identical sets must fully agree: $pairs")
    assert(pairs.contains(("a", "c")) && pairs(("a", "c")) < 32L,
      s"90%-overlap sets should share a band at r=2: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == "d" || p._2 == "d"),
      s"disjoint set must not pair: $pairs")
  }

  test("bandedSignaturePairs is signaturePairs restricted to band-sharing " +
    "pairs (same exact n_match where both emit)") {
    val rnd = new scala.util.Random(7)
    val groups = Seq.tabulate(12)(g => s"g$g")
    val rows = groups.flatMap { g =>
      val base = rnd.nextInt(6) * 30
      Seq.tabulate(60)(i => g -> s"tok${base + rnd.nextInt(80)}")
    }
    val sigs = SetSketch.groupMinhash(rows.toDF("g", "item"), "g", "item", 32)
      .cache()
    val full = SetSketch.signaturePairs(sigs, "g")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val banded = SetSketch.bandedSignaturePairs(sigs, "g", 32, bands = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    sigs.unpersist()
    assert(banded.keySet.subsetOf(full.keySet))
    banded.foreach { case (k, n) => assert(full(k) == n, s"$k: $n vs ${full(k)}") }
    // every banded pair genuinely agrees on >= r slots (necessary condition)
    banded.values.foreach(n => assert(n >= 4))
  }

  test("maxBucket drops a crowded band bucket; equal-signature pairs are " +
    "unaffected (they never enter a bucket)") {
    // five DISTINCT signatures sharing band 0 exactly (slots [1,2]) — the
    // mirror-farm shape: near-identical signatures crowding one bucket
    val crowd = (1 to 5).map(i => (s"g$i", Seq(1L, 2L, 100L + i, 200L + i)))
    val equal = Seq(("e1", Seq(9L, 9L, 9L, 9L)), ("e2", Seq(9L, 9L, 9L, 9L)))
    val sigDf = (crowd ++ equal).toDF("g", "signature")
    val uncapped = SetSketch.bandedSignaturePairs(sigDf, "g", 4, bands = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(uncapped.contains(("e1", "e2")))
    assert(uncapped.count(p => p._1.startsWith("g")) == 10,
      s"all 5-choose-2 crowd pairs should surface via band 0: $uncapped")
    val capped = SetSketch
      .bandedSignaturePairs(sigDf, "g", 4, bands = 2, maxBucket = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped == Set(("e1", "e2")),
      s"crowded bucket must be dropped at the cap, equal pair kept: $capped")
  }

  test("the signature aggregation partial-aggregates map-side") {
    val df = Seq("a" -> "x", "b" -> "y").toDF("g", "item")
    val plan = SetSketch.groupMinhash(df, "g", "item", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"no partial aggregation in:\n$plan")
  }
}

class Fingerprint2KernelSpec extends SparkSpec {
  import spark.implicits._

  test("re-based native fold is bit-exact vs the composed baseline") {
    val rnd = new scala.util.Random(13)
    val strs = Seq("", "a", "tok7", "hello world", "élève") ++
      Seq.fill(200)(Seq.fill(1 + rnd.nextInt(20))(
        (32 + rnd.nextInt(95)).toChar).mkString)
    val df = strs.toDF("s")
    val out = df.select(
      SetSketch.fingerprint2(org.apache.spark.sql.functions.col("s")).as("n"),
      SetSketch.fingerprint2Composed(org.apache.spark.sql.functions.col("s")).as("c"))
      .collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
