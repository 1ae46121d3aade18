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
    *
    * `bloomRestrict` (shuffle path only, requires `hashed`) pre-filters
    * the corpus grams with a Bloom filter of the benchmark gram hashes
    * BEFORE the exchange: on a decontamination run the corpus-side gram
    * shuffle is the dominant cost and almost none of it matches, so
    * dropping non-members at the scan (codegen'd `might_contain`, false
    * positives only) shrinks the exchange from "every gram in the corpus"
    * to "matches + fpp". The Bloom sketch is a bounded driver scalar (a
    * few bits per benchmark gram — MBs where the gram set itself is GBs),
    * and the exact join still runs after it, so output is UNCHANGED
    * (specced): the Bloom can only let extra rows into the exchange,
    * never drop a true match. */
  def ngramOverlap(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      hashed: Boolean = true,
      broadcastGrams: Boolean = true,
      bloomRestrict: Boolean = false,
      bloomFpp: Double = 0.03
  ): DataFrame = {
    require(!bloomRestrict || hashed,
      "bloomRestrict requires hashed=true (the sketch keys on gram hashes)")
    def keyed(g: org.apache.spark.sql.Column) =
      if (hashed) xxhash64(g) else g

    val benchGrams = benchmark
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .select(keyed(col("g")).as("k"))
      .distinct()

    val corpusGrams0 = corpus
      .select(col(idCol).as(idCol),
        explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .select(col(idCol), keyed(col("g")).as("k"))

    val corpusGrams =
      if (!bloomRestrict) corpusGrams0
      else {
        import org.apache.spark.sql.graft.ColumnBridge
        // two scalar jobs over the (small) benchmark side: size the sketch,
        // build it — Spark's own runtime-filter machinery (the expressions
        // behind spark.sql.optimizer.runtimeFilter.bloomFilter), driven
        // explicitly so the restriction survives any optimizer setting
        val items = math.max(benchGrams.count(), 1L)
        val nBits = math.max(
          (-items * math.log(bloomFpp) / (math.log(2) * math.log(2))).toLong, 64L)
        // BloomFilterAggregate SILENTLY clamps its arguments to the
        // session's runtime-bloom-filter caps (defaults 4M items / 64M
        // bits): past them the realized fpp quietly degrades and the
        // exchange reduction fades — output stays correct (the exact join
        // follows), so warn rather than fail, naming the confs to raise
        val spark = corpus.sparkSession
        def conf(k: String, dflt: Long) =
          spark.conf.getOption(k).map(_.toLong).getOrElse(dflt)
        val maxItems = conf(
          "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
        val maxBits = conf(
          "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
        if (items > maxItems || nBits > maxBits)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"bloomRestrict: benchmark gram set needs $items items / $nBits " +
              s"bits but the session caps the Bloom sketch at $maxItems / " +
              s"$maxBits — realized fpp will exceed $bloomFpp and the " +
              "exchange reduction degrades; raise " +
              "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits")
        val bloomBin = benchGrams.agg(ColumnBridge.column(
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(
              ColumnBridge.expression(col("k")),
              org.apache.spark.sql.catalyst.expressions.Literal(items),
              org.apache.spark.sql.catalyst.expressions.Literal(nBits))
            .toAggregateExpression()).as("bf"))
          .head().getAs[Array[Byte]]("bf")
        corpusGrams0.filter(ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            ColumnBridge.expression(lit(bloomBin)),
            ColumnBridge.expression(col("k")))))
      }

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
