package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused native vector kernels must be bit-identical to the composed
  * Column folds they replace — same sequential accumulation order, same
  * null/zero edge semantics — or the DuckDB oracles would drift. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }.toDF("id", "v")
  }

  test("native cosine is bit-identical to the composed fold on random vectors") {
    val a = vecDf(1).withColumnRenamed("v", "a")
    val b = vecDf(2).withColumnRenamed("v", "b")
    val both = a.join(b, "id")
    val out = both.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fused"),
      VectorFunctions.cosineComposed(col("a"), col("b")).as("composed"))
      .collect()
    assert(out.length == 200)
    out.foreach { r =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native cosine edge cases: zero vector, mismatched dims, null element") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),        // identical
      (2L, Array(0f, 0f, 0f), Array(1f, 2f, 3f)),        // zero norm -> 0.0
      (3L, Array(1f, 2f), Array(1f, 2f, 3f))             // dim mismatch -> null
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      VectorFunctions.cosine(col("a"), col("b")).as("c"),
      VectorFunctions.cosineComposed(col("a"), col("b")).as("cc"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L)._1.contains(1.0) && out(1L)._2.contains(1.0))
    assert(out(2L)._1.contains(0.0) && out(2L)._2.contains(0.0))
    assert(out(3L)._1.isEmpty && out(3L)._2.isEmpty)

    // null vector -> null through both paths
    val nv = Seq((1L, Option.empty[Array[Float]], Some(Array(1f, 2f))))
      .toDF("id", "a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    assert(nv.head().isNullAt(0))
  }

  test("native dot is bit-identical to the composed fold, including " +
    "against a literal double-array side (the IVF centroid shape)") {
    val a = vecDf(4).withColumnRenamed("v", "a")
    val b = vecDf(5).withColumnRenamed("v", "b")
    val both = a.join(b, "id")
    both.select(
      VectorFunctions.dot(col("a"), col("b")).as("fused"),
      VectorFunctions.dotComposed(col("a"), col("b")).as("composed"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    // float column vs literal double array — exactly centroidCols' shape
    val rnd = new scala.util.Random(9)
    val centroid = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    val centroidCol = array(centroid.map(lit): _*)
    vecDf(6).select(
      VectorFunctions.dot(col("v"), centroidCol).as("fused"),
      VectorFunctions.dotComposed(col("v"), centroidCol).as("composed"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
  }

  test("native dot/cosine accept integer-quantized arrays like the " +
    "composed cast-to-double folds did") {
    val rnd = new scala.util.Random(21)
    val df = (0 until 100).map { i =>
      (i.toLong,
        Array.fill(32)(rnd.nextInt(255) - 127),
        Array.fill(32)((rnd.nextInt(255) - 127).toLong))
    }.toDF("id", "qa", "qb") // array<int> x array<bigint>
    df.select(
      VectorFunctions.dot(col("qa"), col("qb")).as("fused"),
      VectorFunctions.dotComposed(col("qa"), col("qb")).as("composed"),
      VectorFunctions.cosine(col("qa"), col("qb")).as("cfused"),
      VectorFunctions.cosineComposed(col("qa"), col("qb")).as("ccomposed"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)))
      }
  }

  test("native dot edge cases: empty arrays fold to 0.0, dim mismatch and " +
    "null element go null") {
    val df = Seq(
      (1L, Array.empty[Float], Array.empty[Float]),
      (2L, Array(1f, 2f), Array(1f, 2f, 3f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.dotComposed(col("a"), col("b")).as("dc"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L)._1.contains(0.0) && out(1L)._2.contains(0.0))
    assert(out(2L)._1.isEmpty && out(2L)._2.isEmpty)
  }

  test("native slotAgreement is identical to the composed zip_with fold, " +
    "including length mismatch and null slots") {
    val rnd = new scala.util.Random(11)
    // pairs drawn from a small value space so agreements actually occur
    val df = (0 until 300).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextInt(4).toLong),
        Array.fill(64)(rnd.nextInt(4).toLong))
    }.toDF("id", "a", "b")
    df.select(
      MinHash.estJaccard(col("a"), col("b")).as("fused"),
      MinHash.estJaccardComposed(col("a"), col("b")).as("composed"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    // mismatched lengths: zip_with pads with nulls -> those slots count 0
    graft.GraftExtensions.register(spark)
    val edge = Seq(
      (1L, Array(1L, 2L, 3L), Array(1L, 2L)),
      (2L, Array.empty[Long], Array(1L, 2L)),
      (3L, Array(5L, 5L, 5L), Array(5L, 5L, 5L))
    ).toDF("id", "a", "b")
    val out = edge.select(col("id"),
      expr("graft_slot_agreement(a, b)").as("fused"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v).as("composed"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((2L, 2L)))
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((3L, 3L)))
    // null input -> null through both paths
    val nv = Seq((Option.empty[Array[Long]], Some(Array(1L))))
      .toDF("a", "b")
      .select(expr("graft_slot_agreement(a, b)"))
    assert(nv.head().isNullAt(0))
  }

  test("native lshBucket matches the composed bucket on random vectors") {
    val planes = VectorFunctions.hyperplanes(numPlanes = 12, dim = 64, seed = 7)
    val out = vecDf(3).select(
      VectorFunctions.lshBucket(col("v"), planes).as("fused"),
      VectorFunctions.lshBucketComposed(col("v"), planes).as("composed"))
      .collect()
    assert(out.length == 200)
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // buckets actually spread (not everything collapsing to one value)
    assert(out.map(_.getLong(0)).distinct.length > 20)
  }

  test("native lshBucket dim mismatch mirrors composed null-poisoned folds") {
    val planes = VectorFunctions.hyperplanes(numPlanes = 4, dim = 8, seed = 7)
    val df = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v") // dim 3 != 8
    val fused = df.select(VectorFunctions.lshBucket(col("v"), planes)).head().getLong(0)
    val composed = df.select(VectorFunctions.lshBucketComposed(col("v"), planes))
      .head().getLong(0)
    assert(fused == composed && fused == 0L)
  }
}

/** Native rolling fingerprint must match the composed fold bit-for-bit —
  * including multibyte code points (ascii() yields code points, and so
  * must the byte-walking kernel). */
class RollingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("native fingerprint equals composed on corpus docs and edge strings") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
      .select(col("text").as("t"))
    val edge = Seq("", "a", "ab", "héllo wörld", "日本語テキスト", "mixed é 語 x",
      "   spaces   ", "\ttabs\n").toDF("t")
    val all = docs.unionByName(edge)
    val out = all.select(
      TextFunctions.fingerprint(col("t")).as("fused"),
      TextFunctions.fingerprintComposed(col("t")).as("composed"))
      .collect()
    assert(out.length == 108)
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
