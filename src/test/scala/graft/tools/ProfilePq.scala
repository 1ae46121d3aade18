package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch A/B for the quantized top-k path at scale: does spreading the
  * low-row-group embeddings scan before the cosine kernels pay for its
  * shuffle (vectors are ~300 B/row — unlike the text corpora where the
  * same trade measured net-negative)? Test-scoped tool, not shipped. */
object ProfilePq {
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
        val t0 = System.nanoTime(); val c0 = cpu.cpuNs.get
        mk.write.format("noop").mode("overwrite").save()
        org.apache.spark.graftbench.SparkInternals.drainListenerBus(
          spark.sparkContext)
        ((System.nanoTime() - t0) / 1e9, (cpu.cpuNs.get - c0) / 1e9)
      }
      println(f"[prof] $label%-28s wall ${ts.map(t => f"${t._1}%6.2f").mkString(" ")}" +
        f"  cpu ${ts.map(t => f"${t._2}%6.1f").mkString(" ")}")
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    time("pq_topk-asis") {
      Similarity.quantizedTopK(e, q, "vec_id", "embedding",
        k = 5, rerankDepth = Int.MaxValue)
    }
    val eSpread = e.repartition(32, col("vec_id"))
    time("pq_topk-spread") {
      Similarity.quantizedTopK(eSpread, q, "vec_id", "embedding",
        k = 5, rerankDepth = Int.MaxValue)
    }
    spark.stop()
  }
}
