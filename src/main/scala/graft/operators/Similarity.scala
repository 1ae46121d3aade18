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
    * recall, more work). */
  def annBuckets(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int = 12,
      dim: Int = 64,
      seed: Long = 42L,
      minCos: Double = 0.0
  ): DataFrame = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim, seed)
    val bucketed = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshBucket(col(vecCol), planes).as("bucket"))

    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))

    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
