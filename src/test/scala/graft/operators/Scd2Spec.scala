package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // user 1: a -> a -> b -> a   (three runs; consecutive equal collapses)
    (1L, 100L, 1L, "a"), (1L, 200L, 2L, "a"), (1L, 300L, 3L, "b"),
    (1L, 400L, 4L, "a"),
    // user 2: single run, stays current
    (2L, 150L, 5L, "x"), (2L, 250L, 6L, "x")
  ).toDF("user_id", "ts", "event_id", "attr")

  test("buildHistory collapses runs into validity intervals with versions") {
    val out = Scd2.buildHistory(log, "user_id", "ts", Seq("attr"), Seq("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("attr"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("version"))).toSet
    assert(out == Set(
      (1L, "a", 100L, Some(300L), 1L),
      (1L, "b", 300L, Some(400L), 2L),
      (1L, "a", 400L, None, 3L),
      (2L, "x", 150L, None, 1L)))
  }

  test("history plans with a single exchange on the entity key") {
    val plan = Scd2.buildHistory(log, "user_id", "ts", Seq("attr"), Seq("event_id"))
      .queryExecution.executedPlan.toString
    val n = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    assert(n == 1, s"expected one shuffle, got $n:\n$plan")
  }

  test("tie-breaking on orderCols keeps equal-timestamp runs deterministic") {
    val ties = Seq(
      (1L, 100L, 2L, "b"), (1L, 100L, 1L, "a"), (1L, 100L, 3L, "b")
    ).toDF("user_id", "ts", "event_id", "attr")
    val out = Scd2.buildHistory(ties, "user_id", "ts", Seq("attr"), Seq("event_id"))
      .select("attr", "version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // order by (ts, event_id): a then b,b -> two runs
    assert(out == Set(("a", 1L), ("b", 2L)))
  }
}

class Scd2OrderInvarianceSpec extends SparkSpec {
  import spark.implicits._

  test("history is invariant to input row order and partitioning") {
    val rnd = new scala.util.Random(3)
    val events = for {
      u <- 1L to 20L
      i <- 1 to 40
    } yield (u, i * 10L + rnd.nextInt(5), u * 1000 + i,
      s"s${rnd.nextInt(3)}")
    def hist(rows: Seq[(Long, Long, Long, String)], parts: Int) =
      Scd2.buildHistory(
        rows.toDF("user_id", "ts", "event_id", "attr").repartition(parts),
        "user_id", "ts", Seq("attr"), Seq("event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)), r.getLong(4))).toSet
    val base = hist(events, 4)
    assert(base == hist(rnd.shuffle(events), 7))
    assert(base == hist(events.reverse, 1))
    assert(base.nonEmpty)
  }
}
