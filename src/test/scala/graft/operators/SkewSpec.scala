package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  lazy val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  lazy val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")

  test("saltedAgg equals the unsalted aggregation") {
    val salted = Skew.saltedAgg(lineitem, Seq("l_returnflag"),
      Map("sum_qty" -> col("l_quantity")), numSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the unsalted inner join") {
    val salted = Skew.saltedJoin(lineitem, supplier, "l_suppkey", "s_suppkey",
      numSalts = 8)
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = lineitem.join(supplier,
      lineitem("l_suppkey") === supplier("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("internal helper column names on the input fail fast, not silently") {
    // a user '__salt' column would be overwritten by the salting
    // withColumn and then dropped — data loss with no error
    val poisoned = lineitem.withColumn("__salt", lit(1))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(poisoned, supplier, "l_suppkey", "s_suppkey")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(poisoned, Seq("l_returnflag"),
        Map("s" -> col("l_quantity")))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sessionize.byGap(
        lineitem.withColumn("session_id", lit(1)),
        "l_suppkey", "l_shipdate", 60)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.StreamDedup.hashKey(
        lineitem.withColumn("__dedup_key", lit(1)), Seq("l_suppkey"))
    }
  }
}

class StatefulSessionizeSpec extends SparkSpec {
  import graft.streaming.StatefulSessionize
  import spark.implicits._

  test("stateful assignment matches window-based sessionize on static data") {
    val events = eventsTable()
      .select(col("user_id"),
        col("ts").cast("timestamp").cast("long").as("ts_epoch"))
      .as[StatefulSessionize.EventIn]

    val stateful = StatefulSessionize.assign(events, 1800)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val eventsTs = eventsTable()
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val windowed = Sessionize.byGap(eventsTs, "user_id", "ts", 1800)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(stateful == windowed && stateful.nonEmpty)
  }
}

class SamplingSpec extends SparkSpec {
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hashSample is deterministic, partition-independent, and composable") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "partitioning must not change membership")
    val small = Sampling.hashSample(docs, col("doc_id"), 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a), "samples must nest across fractions")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"fraction off: $frac")
  }

  test("stratifiedHashSample respects per-stratum fractions") {
    val sampled = Sampling.stratifiedHashSample(docs, col("lang"),
      col("doc_id"), Map("en" -> 1.0, "de" -> 0.0))
    val langs = sampled.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(sampled.count() == enTotal)
  }
}

class ProfileSpec extends SparkSpec {
  import spark.implicits._
  test("nullsAndDistinct computes exact per-column stats in one pass") {
    val df = Seq((1, Some("a")), (2, Some("a")), (3, None)).toDF("id", "v")
    val out = Profile.nullsAndDistinct(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("id") == ((3L, 0L, 3L)))
    assert(out("v") == ((3L, 1L, 1L)))
  }

  test("nullsAndDistinctApprox: no Expand in the plan, counts within rsd") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")

    // the exact variant pays an Expand (row blowup ×(n_cols+1)); the HLL
    // variant must not — that is its entire reason to exist
    val exactPlan = Profile.nullsAndDistinct(docs)
      .queryExecution.executedPlan.toString
    val approxPlan = Profile.nullsAndDistinctApprox(docs)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"))

    val exact = Profile.nullsAndDistinct(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.nullsAndDistinctApprox(docs, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    for ((c, n) <- exact) {
      val a = approx(c)
      assert(math.abs(a - n).toDouble <= math.max(n * 0.1, 2.0),
        s"column $c: approx $a vs exact $n")
    }
    // null counts remain exact in both variants
    val nulls = Profile.nullsAndDistinctApprox(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nulls.values.forall(_ == 0L))
  }

  test("numericSummaryApprox: one-pass sketch quantiles near exact") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Profile.numericSummaryApprox(docs, Seq("doc_id", "n_chars"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)

    val exact = docs.selectExpr(
      "percentile(n_chars, 0.5)",
      "cast(min(n_chars) as double)", "cast(max(n_chars) as double)")
      .head()
    val nc = out("n_chars")
    assert(nc.getAs[Double]("min") == exact.getDouble(1))
    assert(nc.getAs[Double]("max") == exact.getDouble(2))
    // sketch p50 within 5% of exact median
    assert(math.abs(nc.getAs[Double]("p50") - exact.getDouble(0))
      <= exact.getDouble(0) * 0.05)
    assert(nc.getAs[Double]("p50") <= nc.getAs[Double]("p90"))
    assert(nc.getAs[Double]("p90") <= nc.getAs[Double]("p99"))
  }
}
