package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for kmeans_train (r16 tuning — not part of the
  * shipped surface). Times each pipeline stage of the registered query in
  * isolation: `sbt "Test/runMain graft.operators.KMeansProf <sfdir>"`. */
object KMeansProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("kmeans-prof")
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime
      val r = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.select(col("vec_id"),
      KMeans.latticeQuantize(col("embedding"), 64).as("q"))
    val seeds = tm("seeds")(q.orderBy("vec_id").limit(8).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](1)) }.toSeq)
    tm("quantize+count")(q.select("q").count())
    tm("assign-only")(q.select(
      KMeans.assignLattice(col("q"), seeds).as("cid"))
      .groupBy("cid").count().collect().length)
    tm("assign-again")(q.select(
      KMeans.assignLattice(col("q"), seeds).as("cid"))
      .groupBy("cid").count().collect().length)
    tm("iter(assign+posexplode+agg)")(q.select(
      KMeans.assignLattice(col("q"), seeds).as("cid"),
      posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().length)
    tm("refine-iters2")(KMeans.refineLattice(q.select("q"), "q", seeds, 2))
    spark.stop()
  }
}
