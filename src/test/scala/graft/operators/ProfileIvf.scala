package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.PqRepo

/** Scratch stage profiler for the IVF-PQ lifecycle (r20 optimization
  * round — not shipped): times build / train / write / append / read /
  * search in isolation, matching the registered ivfpq_append query's
  * geometry, plus file counts per table. Run via
  * `sbt "Test/runMain graft.operators.ProfileIvf <dir> [reps]"`. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val s = SparkSession.builder()
      .appName("profile-ivf")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    t("warmup count")(e.count())
    (1 to reps).foreach { rep =>
      println(s"== rep $rep")
      val repoDir = java.nio.file.Files.createTempDirectory("prof_ivfpq").toString
      val repo = PqRepo(s, repoDir)
      val base = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val batch = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      val built = t("ivfBuild (seed+1 iter)")(
        Similarity.ivfBuild(base, "vec_id", "embedding",
          numCentroids = 16, kmeansIters = 1))
      val books = t("pqTrain")(Similarity.pqTrain(base, "vec_id", "embedding",
        m = 8, ksub = 16, kmeansIters = 4, sampleRows = 1024))
      t("writeIvfPqIndex")(
        Similarity.writeIvfPqIndex(repo, built, books, "ann", "emb"))
      t("appendToIvfPqIndex")(
        Similarity.appendToIvfPqIndex(repo, batch, "vec_id", "embedding",
          "ann", "emb"))
      val idx = t("readIvfPqIndex")(Similarity.readIvfPqIndex(repo, "ann", "emb"))
      t("search (nprobe-all, noop)")(noop(
        Similarity.ivfPqSearch(idx, e,
          e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nprobe = 16, rerankDepth = Int.MaxValue)))
      def files(p: String): Int = {
        var n = 0
        java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          .forEach(f => if (f.toString.endsWith(".parquet")) n += 1)
        n
      }
      println("[prof] files ivfpq=" + files(s"$repoDir/ann/emb_ivfpq.parquet"))
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
