package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Group-level MinHash signatures: set similarity BETWEEN GROUPS.
  *
  * Document-level MinHash ([[Dedup.minhashPairs]]) asks "which documents
  * are near-duplicates"; this asks "which GROUPS have near-identical item
  * sets" — which crawl domains share a vocabulary, which sources mirror
  * each other, which partitions carry the same entity population. Each
  * group's unbounded item set compresses to a fixed `numHashes`-long
  * signature, and signature agreement estimates Jaccard similarity, so
  * comparing groups costs O(numHashes) regardless of set size.
  *
  * Spark-first by composition: the signature is `numHashes` ordinary `min`
  * aggregates over Kirsch–Mitzenmacher double hashing `(h1 + i*h2) mod p`
  * of two independent Karp–Rabin item fingerprints — partial-aggregated
  * map-side like any min, one shuffle of `numHashes` longs per group, no
  * custom aggregate state. `min` is associative/commutative, so the
  * sketch itself is EXACT (the estimate, not the computation, carries the
  * MinHash error) — which also makes it DuckDB-oracle-able in pure
  * integer arithmetic.
  */
object SetSketch {

  private val P = 2147483647L // 2^31 - 1
  private val Mask32 = 0xFFFFFFFFL
  private val MixC = 0x45d9f3bL

  /** Second Karp–Rabin fold (base 131 mod 1e9+9), independent of
    * [[TextFunctions.fingerprint]]'s (257 mod 1e9+7) — the same
    * zero-allocation native kernel, re-based. */
  private[operators] def fingerprint2(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.RollingFingerprint(
        org.apache.spark.sql.graft.ColumnBridge.expression(c),
        base = 131L, mod = 1000000009L))

  /** Composed-Column baseline for the re-based kernel (spec twin). */
  private[operators] def fingerprint2Composed(c: Column): Column = {
    val codes = transform(split(c, ""), ch => ascii(ch).cast("bigint"))
    when(length(c) === lit(0), lit(0L))
      .otherwise(aggregate(
        slice(codes, lit(2), greatest(size(codes) - lit(1), lit(0))),
        element_at(codes, 1),
        (acc, x) => pmod(acc * lit(131L) + x, lit(1000000009L))))
  }

  /** 32-bit avalanche finisher (xor-shift-multiply, the classic
    * lowbias32 shape): Karp–Rabin folds are rolling hashes, so similar
    * strings get nearby values and the KM min order correlates across
    * hash slots — the finisher destroys that locality. Only `^ >> * &`,
    * so the DuckDB oracle replicates it bit-for-bit. */
  private[operators] def mix32(c: Column): Column = {
    def round(x: Column): Column =
      shiftright(x, 16).bitwiseXOR(x) * lit(MixC) bitwiseAND lit(Mask32)
    val r2 = round(round(c.bitwiseAND(lit(Mask32))))
    shiftright(r2, 16).bitwiseXOR(r2)
  }

  /** MinHash signature per `keyCol` group over the (implicitly distinct)
    * values of `itemCol`: `signature[i] = min over items of
    * (h1 + i*h2) mod (2^31-1)`. Duplicate items cannot change a min, so
    * pre-distincting is an optimization, not a correctness requirement. */
  def groupMinhash(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      numHashes: Int = 64): DataFrame = {
    require(numHashes >= 1 && numHashes <= 512, s"numHashes: $numHashes")
    val hashed = df.select(
      col(keyCol),
      mix32(TextFunctions.fingerprint(col(itemCol))).as("__h1"),
      mix32(fingerprint2(col(itemCol)) + lit(0x9e3779b9L)).bitwiseOR(lit(1L)).as("__h2"))
    val mins = (0 until numHashes).map(i =>
      min(pmod(col("__h1") + lit(i.toLong) * col("__h2"), lit(P))).as(s"__s$i"))
    hashed.groupBy(col(keyCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(keyCol),
        array((0 until numHashes).map(i => col(s"__s$i")): _*).as("signature"))
  }

  /** All group pairs with their signature-agreement count (the Jaccard
    * estimate is `n_match / numHashes`). Signatures are tiny (one row per
    * GROUP), so the pair join is over sketch rows, never over items. */
  def signaturePairs(sigs: DataFrame, keyCol: String): DataFrame = {
    val a = sigs.select(col(keyCol).as("key_a"), col("signature").as("__sa"))
    val b = sigs.select(col(keyCol).as("key_b"), col("signature").as("__sb"))
    a.join(b, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        aggregate(
          zip_with(col("__sa"), col("__sb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("n_match"))
  }
}
