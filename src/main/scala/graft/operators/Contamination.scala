package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which training documents contain
  * word n-grams that also appear in an evaluation/benchmark set — the
  * decontamination pass every serious pre-training pipeline runs (the
  * GPT-3/PaLM-style n-gram overlap check).
  *
  * Shape at 100 TB: a single benchmark's gram set is tiny (eval sets are
  * MBs), so it broadcasts and the corpus side never shuffles — the join is
  * a broadcast semi-join against the scan. A FULL decontamination run
  * against dozens of benchmark suites can exceed what a broadcast should
  * carry (multi-GB gram sets × every executor); `broadcastGrams = false`
  * switches to a shuffled hash join — the corpus side then shuffles
  * (id, 8-byte gram hash) pairs, never document text, and the gram set is
  * partitioned instead of replicated. With `hashed = true` n-grams travel
  * as 8-byte `xxhash64` keys instead of strings (the scale default);
  * `hashed = false` keeps raw strings so an external SQL oracle can
  * reproduce the join exactly (hash≡string and broadcast≡shuffle
  * equivalences are both specced).
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
      hashed: Boolean = true,
      broadcastGrams: Boolean = true
  ): DataFrame = {
    def keyed(g: org.apache.spark.sql.Column) =
      if (hashed) xxhash64(g) else g

    val benchGrams = benchmark
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .select(keyed(col("g")).as("k"))
      .distinct()

    val corpusGrams = corpus
      .select(col(idCol).as(idCol),
        explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .select(col(idCol), keyed(col("g")).as("k"))

    val joined =
      if (broadcastGrams) corpusGrams.join(broadcast(benchGrams), "k")
      // build the hash map from the gram side (the smaller one) — both
      // sides shuffle on k, nothing is replicated to every executor
      else corpusGrams.join(benchGrams.hint("shuffle_hash"), "k")

    joined
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared")) // grams already distinct per doc
  }
}
