package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate duplicate groups — one value copied 100k times — must flow
  * through the salted aggregation paths without any buffer holding the
  * whole group, and the operators' observable semantics must hold: the
  * embedding dedupper still collapses the group to its min id, and
  * exactGroups still emits the complete, sorted id list with an exact
  * count. Light corpora (no group past the probe threshold) are asserted
  * to keep the original exact all-pairs semantics. */
class DegenerateGroupSpec extends SparkSpec {

  private def oneHot(offset: Int) =
    array((0 until 64).map(i =>
      when(col("id") - offset === i, 1f).otherwise(0f).cast("float")): _*)

  test("100k-copy vector group: dropEmbeddingDuplicates keeps min id, " +
    "salted path engaged") {
    val dupVec = array((0 until 64).map(i => lit((i + 1).toFloat)): _*)
    val copies = spark.range(100000)
      .select(col("id").as("vec_id"), dupVec.as("embedding"))
    val distinct = spark.range(100000, 100005)
      .select(col("id").as("vec_id"), oneHot(100000).as("embedding"))
    val corpus = copies.unionByName(distinct)

    val out = Similarity.dropEmbeddingDuplicates(
      corpus, "vec_id", "embedding", minCos = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == (Set(0L) ++ (100000L until 100005L)))
  }

  test("light corpus keeps exact all-pairs equal-vector semantics") {
    val v = array((0 until 64).map(i => lit(i.toFloat)): _*)
    val corpus = spark.range(4).select(col("id").as("vec_id"), v.as("embedding"))
      .unionByName(spark.range(100, 103)
        .select(col("id").as("vec_id"), oneHot(100).as("embedding")))
    val pairs = Similarity.annBuckets(corpus, "vec_id", "embedding",
      numPlanes = 8, dim = 64, minCos = 0.999)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 6 pairs of the 4-copy group, nothing else at cos >= 0.999
    val expect = (for {
      a <- 0L until 4L; b <- (a + 1) until 4L
    } yield (a, b)).toSet
    assert(pairs == expect)
  }

  test("100k-copy text group: dropNearDuplicates keeps the min id through " +
    "the salted signature collapse") {
    val copies = spark.range(100000)
      .select(col("id").as("doc_id"),
        lit("the very same boilerplate paragraph, repeated").as("text"))
    val distinct = spark.range(100000, 100005)
      .select(col("id").as("doc_id"),
        concat(lit("unique document body number "), col("id"),
          lit(" with plenty of its own words")).as("text"))
    val out = Dedup.dropNearDuplicates(copies.unionByName(distinct),
      "doc_id", "text", numHashes = 48, bands = 12, threshold = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == (Set(0L) ++ (100000L until 100005L)))
  }

  test("100k-copy text group: exactGroups emits the complete sorted id " +
    "list via the salted two-phase assembly") {
    val texts = spark.range(100000)
      .select(col("id"), lit("the same boilerplate text").as("t"))
      .unionByName(spark.range(100000, 100010)
        .select(col("id"), concat(lit("unique-"), col("id")).as("t")))
    val g = Dedup.exactGroups(texts, col("id"), col("t"))
    val big = g.filter(col("n") === 100000L).collect()
    assert(big.length == 1)
    val ids = big.head.getSeq[Long](big.head.fieldIndex("ids"))
    assert(ids.length == 100000 && ids.head == 0L && ids.last == 99999L)
    assert(ids == ids.sorted)
    assert(g.filter(col("n") === 1L).count() == 10)
  }

  test("salted and unsalted exactGroups agree row-for-row") {
    val texts = spark.range(3000)
      .select(col("id"), concat(lit("txt-"), col("id") % 50).as("t"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("h"), array_join(col("ids").cast("array<string>"), ",").as("ids"),
        col("n"))
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val unsalted = canon(Dedup.exactGroups(texts, col("id"), col("t"),
      broadcastColliding = Some(false)))
    // bigGroupLimit = 1 forces the salted assembly for every group
    val salted = canon(Dedup.exactGroups(texts, col("id"), col("t"),
      bigGroupLimit = 1L))
    assert(salted == unsalted)
  }
}
