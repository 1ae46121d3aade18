package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the 20x headline laggards
  * (embed_ivf_ann / tfidf_topk / pipeline_curate): times each stage of
  * the registered query separately so optimization effort lands where
  * the seconds are. Test-scoped tool, not shipped. */
object ProfileBig {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_big20x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    // ---- embed_ivf_ann ----
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    time("ivf:seed+assign-only") {
      val idx = Similarity.ivfBuild(e, "vec_id", "embedding",
        numCentroids = 16, kmeansIters = 0)
      idx.assigned
    }
    time("ivf:build(iters=1)+assign") {
      val idx = Similarity.ivfBuild(e, "vec_id", "embedding",
        numCentroids = 16, kmeansIters = 1)
      idx.assigned
    }
    time("ivf:full-query") {
      val idx = Similarity.ivfBuild(e, "vec_id", "embedding",
        numCentroids = 16, kmeansIters = 1)
      Similarity.ivfSearch(idx, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 16)
    }

    // ---- tfidf_topk ----
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("tfidf:tf-only") {
      docs.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wsTokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    }
    time("tfidf:full") {
      TfIdf.topTerms(docs, "doc_id", "text", 3)
    }

    // ---- multimodal_image halves ----
    {
      import spark.implicits._
      val ids = docs.select(col("doc_id")).as[Long]
      def media = ids.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + ((id / 16) % 16).toInt
        Multimodal.MediaRow(id,
          Multimodal.solidPng(w, h,
            (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt),
          "image/png", 0, 0)
      }
      time("img:encode-only") { media.toDF().select(length(col("payload"))) }
      time("img:encode+decode") { Multimodal.decodeImages(media).toDF() }
    }

    // ---- pipeline_curate stages ----
    val base = docs.select("doc_id", "text")
    val spaced = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        regexp_replace(col("text"), lit(" "), lit("  ")).as("text"))
    val padded = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(lit("  "), col("text"), lit("  ")).as("text"))
    val all = base.unionByName(spaced).unionByName(padded)
    def gated = all
      .withColumn("lang_pred", graft.functions.TextFunctions.langId(col("text")))
      .withColumn("quality", round(graft.functions.TextFunctions.qualityScore(col("text")), 6))
      .filter(col("lang_pred") === "en" && col("quality") >= 0.3)
      .select("doc_id", "text")
    time("cur:gate") { gated }
    def exactDeduped = Dedup.exact(gated, Seq("text"), Seq(col("doc_id")))
    time("cur:gate+exact") { exactDeduped }
    def normed = exactDeduped
      .withColumn("norm", graft.functions.TextFunctions.normalizeText(col("text")))
    time("cur:+norm") { normed }
    time("cur:+sig-only") {
      normed.select(col("doc_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.expressions.MinHashSignature(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("norm")),
            5, 64)).as("sig"))
    }
    time("cur:+minhashPairs") {
      Dedup.minhashPairs(normed, "doc_id", "norm", threshold = 1.0)
    }
    time("cur:+dropNear(full)") {
      Dedup.dropNearDuplicates(normed, "doc_id", "norm",
        threshold = 1.0, verifyExact = true, persistInput = true)
    }
    time("cur:full-query") {
      graft.SparkEntry.queries("pipeline_curate")(spark, dir)
    }
    spark.stop()
  }
}
