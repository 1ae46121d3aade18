package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns.
  *
  * Brute-force top-k is the exact baseline: the (small) query set is
  * broadcast against the corpus scan — zero shuffle, one pass, then a
  * per-query top-k window on the tiny (query × corpus-partition) result.
  * The LSH path buckets both sides by hyperplane sign pattern so candidate
  * generation is a co-partitioned equi-join on an 8-byte key — the shape
  * that survives a 100×-larger corpus.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k most similar corpus
    * vectors (excluding itself). Output: query_id, cand_id, cos, rank. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))

    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(VectorFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate neighbors: candidates share a hyperplane
    * sign-pattern bucket; cosine is computed only within buckets. Recall
    * is tuned by `numPlanes` (fewer planes → bigger buckets → higher
    * recall, more work).
    *
    * One shuffle (groupBy bucket) with in-bucket pair expansion — a
    * self-join here would re-execute the projection pipeline per side.
    * `maxBucket` guards degenerate buckets at scale. */
  def annBuckets(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int = 12,
      dim: Int = 64,
      seed: Long = 42L,
      minCos: Double = 0.0,
      maxBucket: Int = 2000
  ): DataFrame = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim, seed)
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val bucketed = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(parts, col("id"))
      .select(col("id"), col("v"),
        VectorFunctions.lshBucket(col("v"), planes).as("bucket"))

    // Score + threshold inside the bucket array expression so exploded
    // rows are (id_a, id_b, cos) structs, never vector pairs.
    val pairs = flatten(transform(col("xs"), (x, i) =>
      filter(
        transform(slice(col("xs"), i + lit(2), size(col("xs"))), y =>
          struct(
            least(x.getField("id"), y.getField("id")).as("id_a"),
            greatest(x.getField("id"), y.getField("id")).as("id_b"),
            round(VectorFunctions.cosine(
              x.getField("v"), y.getField("v")), 6).as("cos"))),
        s => s.getField("cos") >= minCos)))

    bucketed
      .groupBy("bucket")
      .agg(collect_list(struct(col("id"), col("v"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
      .select(explode(pairs).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.cos").as("cos"))
  }
}
