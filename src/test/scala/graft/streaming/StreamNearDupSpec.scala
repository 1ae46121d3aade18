package graft.streaming

import graft.streaming.StreamNearDup._

/** Streaming MinHash-LSH near-dup (r16; r17: emit-per-live-band): the
  * multi-batch MemoryStream run must emit, for every watermark-closed
  * window, exactly the batch twin's (= per-window
  * [[graft.operators.Dedup.minhashPairs]]) pair SET after the documented
  * per-band multiplicity collapse — including an exact-duplicate
  * est = 1.0 pair, a genuine sub-1.0 near-dup pair, and NO cross-window
  * pair even for identical texts. */
class StreamNearDupSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000)

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "keeps running far beyond the quiet river all afternoon"
  private val near = base + " tired"
  private val other = "completely unrelated content about spark catalyst " +
    "optimizer internals and shuffle partition sizing at scale"

  test("multi-batch stream ≡ batch minhashPairs on closed windows; " +
    "exactly-once; no cross-window pairs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val name = s"nd_${System.nanoTime()}"
    val q = pairsPerWindow(input.toDS(), windowSeconds = 3600,
      shingleK = 5, numHashes = 48, bands = 12, threshold = 0.3)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // window [0, 3600): two exact duplicates, one near-dup, one stranger
      val w0 = Seq(DocEvent(1L, base, ts(100)), DocEvent(2L, base, ts(200)),
        DocEvent(3L, near, ts(300)), DocEvent(4L, other, ts(400)))
      // window [3600, 7200): identical text to window 0 — must pair only
      // within its own window
      val w1 = Seq(DocEvent(5L, base, ts(4000)), DocEvent(6L, base, ts(4100)))
      input.addData(w0: _*)
      q.processAllAvailable()
      // both windows still open — append mode must have emitted nothing
      assert(spark.table(name).count() == 0)
      input.addData(w1: _*)
      q.processAllAvailable()

      // sentinels: far-future events that advance the watermark past both
      // window ends; timeout fires on the following trigger (watermark is
      // batch-lagged). They must be LONG enough to pass the shingle
      // filter — Catalyst pushes that filter below the watermark stats
      // collector, so a filtered row advances nothing. Their own window
      // never closes, so they emit nothing themselves.
      input.addData(DocEvent(-1L, "sentinel advance one", ts(100000)))
      q.processAllAvailable()
      input.addData(DocEvent(-2L, "sentinel advance two", ts(100001)))
      q.processAllAvailable()

      val got = spark.table(name).as[NearDupPair].collect()
      val gotSet = got.map(p => (p.window_start, p.id_a, p.id_b, p.est_jaccard)).toSet
      // MULTIPLICITY contract: a pair arrives once per live colliding
      // band (≤ bands identical copies), never more
      val counts = got.groupBy(p => (p.window_start, p.id_a, p.id_b))
        .view.mapValues(_.length)
      assert(counts.values.forall(c => c >= 1 && c <= 12), counts.toMap)
      // identical-signature pairs collide in EVERY band → exactly `bands`
      // copies when no bucket is crowded
      assert(counts((0L, 1L, 2L)) == 12, counts.toMap)

      val batch = pairsBatch(
        (w0 ++ w1).map(d => (d.doc_id, d.text, d.ts)).toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", windowSeconds = 3600,
        shingleK = 5, numHashes = 48, bands = 12, threshold = 0.3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(gotSet == batch, s"stream $gotSet vs batch $batch")

      // structure: the exact pair at 1.0, the near pair strictly below,
      // the stranger and cross-window combinations absent
      assert(gotSet.contains((0L, 1L, 2L, 1.0)))
      assert(gotSet.contains((3600L, 5L, 6L, 1.0)))
      val nearPairs = got.filter(p => p.id_b == 3L)
      assert(nearPairs.nonEmpty &&
        nearPairs.forall(p => p.est_jaccard >= 0.3 && p.est_jaccard < 1.0),
        got.mkString(","))
      assert(!got.exists(p => p.id_a == 4L || p.id_b == 4L), "stranger paired")
      assert(!got.exists(p => p.id_a <= 2L && p.id_b >= 5L), "cross-window pair")
    } finally q.stop()
  }

  test("over-maxBucket buckets emit nothing (the batch crowding guard), " +
    "under-cap windows are unaffected") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val name = s"ndcap_${System.nanoTime()}"
    val q = pairsPerWindow(input.toDS(), windowSeconds = 3600,
      shingleK = 5, numHashes = 48, bands = 12, threshold = 0.3,
      maxBucket = 3)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // 4 identical docs crowd every band bucket past the cap of 3
      input.addData((1 to 4).map(i => DocEvent(i.toLong, base, ts(100 + i))): _*)
      // a clean under-cap pair in the same window, different text
      input.addData(DocEvent(10L, other, ts(500)), DocEvent(11L, other, ts(600)))
      q.processAllAvailable()
      input.addData(DocEvent(-1L, "sentinel advance one", ts(100000)))
      q.processAllAvailable()
      input.addData(DocEvent(-2L, "sentinel advance two", ts(100001)))
      q.processAllAvailable()
      val got = spark.table(name).as[NearDupPair].collect()
      assert(got.toSet == Set(NearDupPair(0L, 10L, 11L, 1.0)), got.mkString(","))
    } finally q.stop()
  }

  // period-5 strings sharing their full 5-shingle SET while differing in
  // bytes: every rotation of "abcde" occurs in both, so the MinHash
  // signatures are IDENTICAL (a full-signature collision between
  // non-duplicates — the planted adversary for digest verification)
  private val periodic = "abcde" * 5
  private val rotated = "bcdea" * 5

  test("verify=true kills a full-signature-collision non-duplicate via the " +
    "in-state digest and keeps byte-exact pairs; ≡ batch verified twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def run(verify: Boolean): Set[(Long, Long, Long, Double)] = {
      val input = MemoryStream[DocEvent]
      val name = s"ndv_${verify}_${System.nanoTime()}"
      val q = pairsPerWindow(input.toDS(), windowSeconds = 3600,
        shingleK = 5, numHashes = 48, bands = 12, threshold = 1.0,
        verify = verify)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(DocEvent(1L, periodic, ts(100)),
          DocEvent(2L, rotated, ts(200)), DocEvent(3L, periodic, ts(300)))
        q.processAllAvailable()
        input.addData(DocEvent(-1L, "sentinel advance one", ts(100000)))
        q.processAllAvailable()
        input.addData(DocEvent(-2L, "sentinel advance two", ts(100001)))
        q.processAllAvailable()
        spark.table(name).as[NearDupPair].collect()
          .map(p => (p.window_start, p.id_a, p.id_b, p.est_jaccard)).toSet
      } finally q.stop()
    }
    // sanity: the collision is real — unverified emits all three pairs at 1.0
    assert(run(verify = false) ==
      Set((0L, 1L, 2L, 1.0), (0L, 1L, 3L, 1.0), (0L, 2L, 3L, 1.0)))
    // verified: only the byte-exact pair survives
    val streamVerified = run(verify = true)
    assert(streamVerified == Set((0L, 1L, 3L, 1.0)))
    // and it equals the batch VERIFIED twin on the same frame
    val batchVerified = pairsBatch(
      Seq((1L, periodic, ts(100)), (2L, rotated, ts(200)),
        (3L, periodic, ts(300))).toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", windowSeconds = 3600,
      shingleK = 5, numHashes = 48, bands = 12, threshold = 1.0,
      verified = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamVerified == batchVerified, s"$streamVerified vs $batchVerified")
  }
}
