package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHash, SimHash, TextFunctions}

/** Deduplication operators for training-data pipelines.
  *
  * Exact dedup keeps one deterministic representative per key. Near-dup
  * variants (MinHash-LSH, SimHash) emit verified candidate pairs; at 100 TB
  * only fixed-width sketches shuffle — documents stay where the scan put
  * them.
  */
object Dedup {

  /** Keep the first row per key under `order` — deterministic exact dedup
    * (`row_number() = 1`). The shuffle key is the key columns only;
    * map-side nothing is dropped, but Spark's window exec sorts within
    * partitions once. */
  def exact(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-dup groups: for content dedup at scale, group on the 8-byte
    * `xxhash64(content)` first so the shuffle moves hashes, not documents;
    * survivors re-verify on content to make collisions impossible to
    * mis-merge. Returns (content hash, ids, n). */
  def exactGroups(df: DataFrame, id: Column, content: Column): DataFrame =
    df.select(id.as("id"), xxhash64(content).as("h"), content.as("c"))
      .groupBy("h", "c")
      .agg(sort_array(collect_list("id")).as("ids"), count("*").as("n"))
      .drop("c")

  /** MinHash-LSH near-duplicate pairs.
    *
    * docs(idCol, textCol) → verified pairs (id_a < id_b, est_jaccard).
    * Pipeline: distinct char-k-shingles → n-slot signature → b bands —
    * a self-join on (band, bandHash) generates candidates, signature
    * agreement filters them. Only (band, hash, id, signature) shuffles.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands

    val sigs = docs
      .select(col(idCol).as("id"),
        TextFunctions.charShingles(col(textCol), shingleK).as("sh"))
      .select(col("id"), MinHash.hashPairs(col("sh")).as("hp"))
      .select(col("id"), MinHash.signatureFromPairs(col("hp"), numHashes).as("sig"))

    val banded = sigs
      .select(col("id"), col("sig"),
        posexplode(MinHash.bandHashes(col("sig"), bands, r)).as(Seq("band", "bh")))

    val a = banded.select(col("band"), col("bh"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        MinHash.estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      .agg(first("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs: sketch → 16-bit band buckets →
    * candidates → Hamming-distance filter. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 6
  ): DataFrame = {
    val sketched = docs.select(col(idCol).as("id"),
      SimHash.simhash(TextFunctions.wsTokens(col(textCol))).as("sh"))

    val banded = sketched.select(col("id"), col("sh"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"), SimHash.bandKey(col("sh"), j).as("key"))): _*))
        .as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))

    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))

    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SimHash.hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs: |A∩B| / |A∪B|
    * over distinct word n-grams. Joins two doc sets on a provided pair
    * frame; used to verify near-dup candidates exactly. */
  def ngramJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** Distinct word n-grams of a text column. */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = TextFunctions.wsTokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }
}
