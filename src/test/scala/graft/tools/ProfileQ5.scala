package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch attribution for q5_star_join at scale: is the wall in the
  * lineitem scan, the per-order partial aggregate, or the star joins?
  * Test-scoped tool, not shipped. */
object ProfileQ5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_big100x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new graft.Bench.CpuTimeListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c0 = cpu.cpuNs.get
        mk.write.format("noop").mode("overwrite").save()
        org.apache.spark.graftbench.SparkInternals.drainListenerBus(
          spark.sparkContext)
        ((System.nanoTime() - t0) / 1e9, (cpu.cpuNs.get - c0) / 1e9)
      }
      println(f"[prof] $label%-30s wall ${ts.map(t => f"${t._1}%6.2f").mkString(" ")}" +
        f"  cpu ${ts.map(t => f"${t._2}%6.1f").mkString(" ")}")
    }
    def cents(c: org.apache.spark.sql.Column) =
      round(c * 100).cast("bigint")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    time("lineitem-scan+cents") {
      l.select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("c")).filter(col("c") > Long.MinValue)
    }
    time("perOrder-agg") {
      l.groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("rev_c"))
    }
    time("orders-scan") {
      o.select(col("o_orderkey"), col("o_custkey"))
        .filter(col("o_orderkey") > -1)
    }
    time("full-q5") {
      graft.SparkEntry.queries("q5_star_join")(spark, dir)
    }
    // bloom-prefilter variant: drop non-asia lineitem rows BEFORE the
    // per-order aggregate (guide §3.2)
    val n = spark.read.parquet(s"$dir/nation.parquet")
    val r = spark.read.parquet(s"$dir/region.parquet")
      .filter(col("r_name") === "ASIA")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val timesB = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val c0 = cpu.cpuNs.get
      val asiaNations = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val asiaCust = c.join(broadcast(asiaNations),
          c("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val nAsiaCust = asiaCust.count()
      val asiaOrders = o.join(asiaCust.hint("shuffle_hash"),
          o("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("n_name"))
      val bf = asiaOrders.stat.bloomFilter("o_orderkey",
        math.max(1000000L, nAsiaCust * 16), 0.01)
      val bfB = spark.sparkContext.broadcast(bf)
      val mightBe = udf((id: Long) => bfB.value.mightContainLong(id))
      val perOrder = l.filter(mightBe(col("l_orderkey")))
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("rev_c"))
      perOrder.join(asiaOrders.hint("shuffle_hash"),
          perOrder("l_orderkey") === col("o_orderkey"))
        .groupBy("n_name")
        .agg(sum(col("rev_c")).as("revenue_c"),
          count(col("o_orderkey")).as("n_orders"))
        .write.format("noop").mode("overwrite").save()
      bfB.destroy()
      org.apache.spark.graftbench.SparkInternals.drainListenerBus(
        spark.sparkContext)
      ((System.nanoTime() - t0) / 1e9, (cpu.cpuNs.get - c0) / 1e9)
    }
    println(f"[prof] q5-bloom-prefilter             wall ${timesB.map(t => f"${t._1}%6.2f").mkString(" ")}" +
      f"  cpu ${timesB.map(t => f"${t._2}%6.1f").mkString(" ")}")
    spark.stop()
  }
}
