package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end timer for the registered dedup_spans query at a
  * given corpus dir (r15 tuning — not part of the shipped surface).
  * Fresh-JVM usage:
  * `SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.operators.TimeSpansProf <dir>"` */
object TimeSpansProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm scan cache
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      Dedup.dropSharedSpans(docs, "doc_id", "text", k = 8)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] dedup_spans #$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
