package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val permilles = Seq(100, 250, 500, 750, 900, 990)

  test("certificate is all-zero on real documents data at tight and " +
    "coarse accuracy, with exact n and groups x quantiles rows") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val groups = docs.select("lang").distinct().count()
    for (acc <- Seq(100, 10000)) {
      val out = Profile.quantileCertificate(
        docs, "lang", "n_chars", permilles, acc).collect()
      assert(out.length == groups * permilles.size)
      assert(out.forall(_.getAs[Long]("n_violations") == 0L),
        s"accuracy=$acc: ${out.filter(_.getAs[Long]("n_violations") != 0L).toSeq}")
      val nByLang = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      out.foreach(r => assert(r.getAs[Long]("n") == nByLang(r.getString(0))))
    }
  }

  test("guarantee holds on adversarial shapes: sorted, reverse-sorted, " +
    "constant, and two-point-mass groups") {
    val rows =
      (1 to 5000).map(i => ("sorted", i.toLong)) ++
        (1 to 5000).map(i => ("reversed", (5001 - i).toLong)) ++
        (1 to 5000).map(_ => ("constant", 42L)) ++
        (1 to 5000).map(i => ("twopoint", if (i % 10 == 0) 1000L else 1L))
    val df = rows.toDF("g", "v").repartition(7)
    val out = Profile.quantileCertificate(df, "g", "v", permilles, 50)
    assert(out.collect().forall(_.getAs[Long]("n_violations") == 0L))
  }

  test("the certificate DETECTS a planted-wrong estimate (rank outside " +
    "the epsilon window flags 1; a correct one flags 0)") {
    // group of 1..1000; at accuracy 100 the 500-permille window is
    // ranks [490, 510] (+/-1 slack) — value 700 (rank 700) must flag,
    // value 500 must not
    val data = (1L to 1000L).map(("g", _)).toDF("__g", "__v")
    def estOf(v: Long) =
      Seq(("g", 1000L, 500L, v)).toDF("__g", "n", "q_permille", "__q")
    val bad = Profile.certifyQuantiles(data, estOf(700L), 100).collect()
    assert(bad.head.getAs[Long]("n_violations") == 1L)
    val good = Profile.certifyQuantiles(data, estOf(500L), 100).collect()
    assert(good.head.getAs[Long]("n_violations") == 0L)
    // the emitted integer rank window (r17: cross-verified by the
    // oracle) is exactly [489, 510] — target rank 500, eps 10, ±1 slack
    // folded into the bound arithmetic on each side
    assert(good.head.getAs[Long]("r_lo") == 489L)
    assert(good.head.getAs[Long]("r_hi") == 510L)
    // edge of the window (rank 510 = target 500 + eps 10, inside) passes;
    // one past the +1 slack (rank 512) flags
    assert(Profile.certifyQuantiles(data, estOf(510L), 100)
      .head().getAs[Long]("n_violations") == 0L)
    assert(Profile.certifyQuantiles(data, estOf(512L), 100)
      .head().getAs[Long]("n_violations") == 1L)
    // low side: r_le < r_lo — value 488 has r_le = 488 < 489 → flags;
    // value 489 sits ON the bound → passes (the a < t ⟺ a ≤ ceil(t)−1
    // factoring must not shift the boundary by one)
    assert(Profile.certifyQuantiles(data, estOf(488L), 100)
      .head().getAs[Long]("n_violations") == 1L)
    assert(Profile.certifyQuantiles(data, estOf(489L), 100)
      .head().getAs[Long]("n_violations") == 0L)
  }

  test("rank-window bounds match the DuckDB oracle's HUGEINT formula " +
    "across permilles, sizes, and accuracies (incl. negative r_lo)") {
    // replicate the oracle arithmetic in exact BigInt and compare —
    // truncating `div` on the shifted-nonnegative numerator must equal
    // floor division for every (n, q, acc) combination
    for (n <- Seq(1L, 7L, 1000L, 999999L); acc <- Seq(2, 100, 10000);
         q <- Seq(100L, 250L, 500L, 750L, 990L)) {
      val est = Seq(("g", n, q, 1L)).toDF("__g", "n", "q_permille", "__q")
      val data = Seq(("g", 1L)).toDF("__g", "__v")
      val row = Profile.certifyQuantiles(data, est, acc).head()
      val (bn, bq, bs) = (BigInt(n), BigInt(q), BigInt(1000L * acc))
      val t = bq * bn * acc
      val e = bn * 1000
      val rLo = (t - e + bn * bs + bs - 1) / bs - bn - 1
      val rHi = (t + e) / bs
      assert(row.getAs[Long]("r_lo") == rLo.toLong, s"n=$n acc=$acc q=$q")
      assert(row.getAs[Long]("r_hi") == rHi.toLong, s"n=$n acc=$acc q=$q")
    }
  }

  test("null values are excluded from n and from ranks; invalid args fail") {
    val df = (Seq.tabulate(100)(i => ("g", Some(i.toLong))) ++
      Seq.fill(20)(("g", Option.empty[Long]))).toDF("g", "v")
    val out = Profile.quantileCertificate(df, "g", "v", Seq(500), 100).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n") == 100L)
    intercept[IllegalArgumentException] {
      Profile.quantileCertificate(df, "g", "v", Seq(500, 500), 100)
    }
    intercept[IllegalArgumentException] {
      Profile.quantileCertificate(df, "g", "v", Seq(0), 100)
    }
    intercept[IllegalArgumentException] {
      Profile.quantileCertificate(df, "g", "v", Seq(500), 1)
    }
  }
}
