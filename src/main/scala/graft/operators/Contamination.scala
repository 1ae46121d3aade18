package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which training documents contain
  * word n-grams that also appear in an evaluation/benchmark set — the
  * decontamination pass every serious pre-training pipeline runs (the
  * GPT-3/PaLM-style n-gram overlap check).
  *
  * Shape at 100 TB: the benchmark side is tiny (eval sets are MBs), so its
  * distinct n-gram set broadcasts and the corpus side never shuffles — the
  * join is a broadcast semi-join against the scan. With `hashed = true`
  * n-grams travel as 8-byte `xxhash64` keys instead of strings (the scale
  * default); `hashed = false` keeps raw strings so an external SQL oracle
  * can reproduce the join exactly (hash≡string equivalence is specced).
  */
object Contamination {

  /** Per-corpus-document count of distinct word `n`-grams shared with ANY
    * benchmark document. Documents with zero overlap are omitted (a
    * left-join variant is a trivial composition). Output: (idCol, n_shared).
    */
  def ngramOverlap(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      hashed: Boolean = true
  ): DataFrame = {
    def keyed(g: org.apache.spark.sql.Column) =
      if (hashed) xxhash64(g) else g

    val benchGrams = benchmark
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .select(keyed(col("g")).as("k"))
      .distinct()

    corpus
      .select(col(idCol).as(idCol),
        explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .select(col(idCol), keyed(col("g")).as("k"))
      .join(broadcast(benchGrams), "k")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared")) // grams already distinct per doc
  }
}
