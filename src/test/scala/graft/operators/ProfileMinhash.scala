package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for dedup_minhash (r12 tuning — not part of the
  * shipped surface). Times each pipeline stage of the registered query in
  * isolation at a given corpus dir.
  *
  * HEAP: `spark.driver.memory` is a no-op in an already-running local-mode
  * JVM, so the launcher must size the heap itself — run via
  * `SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.operators.ProfileMinhash <dir>"`
  * (build.sbt threads that env var into `-Xmx`); the committed 100×
  * profiling artifacts were produced exactly this way. At the 100× corpus
  * the 8g default GCLocker-OOMs on repeated reps. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder()
      .appName("profile-minhash")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val dup = d.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val u = d.unionByName(dup)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm the scan cache
    time("scan+count")(u.count())
    time("scan+count(2)")(u.count())

    // stage 1: signature kernel alone (no checkpoint)
    val sigsRaw = u
      .select(col("doc_id").as("id"), col("text").as("t"))
      .filter(col("t").isNotNull && octet_length(col("t")) >= 5)
      .select(col("id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.expressions.MinHashSignature(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("t")),
            5, 48, 0)).as("sig"))
    // force the kernel: aggregate over a sig element so pruning can't
    // drop the expression
    time("sig kernel (forced)")(
      sigsRaw.select(sum(element_at(col("sig"), 1))).head())
    time("sig kernel (forced, 2)")(
      sigsRaw.select(sum(element_at(col("sig"), 1))).head())
    // kernel + checkpoint materialization (what the operator does)
    val cp = time("sig + localCheckpoint")(
      sigsRaw.localCheckpoint(eager = true))
    // collapse over the checkpointed signatures: raw-array key vs the
    // 128-bit surrogate key, interleaved, 3 reps each
    def surrogate(sig: org.apache.spark.sql.Column) = struct(
      xxhash64(sig).as("h1"), xxhash64(lit(0x9E3779B97F4A7C15L), sig).as("h2"))
    for (i <- 1 to 3) {
      time(s"collapse RAW key #$i") {
        val keyed = cp.select(col("sig").as("k"), col("id"))
        val (e, p, _) = Dedup.collapseByKey(keyed, 2000)
        (e.select(count(lit(1))).head(), p.select(count(lit(1))).head())
      }
      time(s"collapse SURROGATE #$i") {
        val keyed = cp.select(surrogate(col("sig")).as("k"), col("id"))
        val (e, p, _) = Dedup.collapseByKey(keyed, 2000)
        (e.select(count(lit(1))).head(), p.select(count(lit(1))).head())
      }
    }
    cp.unpersist()

    // full operator, twice
    def fullOld() = {
      val candidates = Dedup.minhashPairs(u, "doc_id", "text",
        shingleK = 5, numHashes = 48, bands = 12, threshold = 1.0)
      Dedup.verifyPairsExact(candidates, u, "doc_id", "text")
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard"), 6).as("est_jaccard"))
    }
    def fullFused() =
      Dedup.minhashPairsVerified(u, "doc_id", "text",
        shingleK = 5, numHashes = 48, bands = 12, threshold = 1.0)
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard"), 6).as("est_jaccard"))
    def clearRdds(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for (i <- 1 to 4) {
      clearRdds()
      time(s"full OLD   #$i")(fullOld().select(count(lit(1))).head())
      clearRdds()
      time(s"full FUSED #$i")(fullFused().select(count(lit(1))).head())
    }
    // the bench's exact consumption shape
    for (i <- 1 to 3) {
      clearRdds()
      time(s"FUSED noop-write #$i")(
        fullFused().write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
