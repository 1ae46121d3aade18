package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage bisection for the dedup_embed scale mover (r18 task 1):
  * times the candidate-pair stage (annBuckets) and the full
  * drop-duplicates pipeline separately on any corpus dir, so a
  * wall-time move can be attributed to pairing vs components/anti-join.
  * Usage: runMain graft.tools.BisectDedupEmbed <dir> [reps]
  */
object BisectDedupEmbed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_big20x")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpusInt = scala.util.Try(cpus.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpusInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus() = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val copies = e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      e.unionByName(copies)
    }

    def time(label: String)(f: => Unit): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[bisect] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("pairs_only") {
      graft.operators.Similarity.annBuckets(corpus(), "vec_id", "embedding",
        numPlanes = 0, dim = 64, minCos = 0.999, autoFloor = 8)
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    time("full_drop") {
      graft.operators.Similarity.dropEmbeddingDuplicates(corpus(),
        "vec_id", "embedding", minCos = 0.999)
        .select("vec_id")
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
