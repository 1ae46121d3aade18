package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 64-bit SimHash over token arrays.
  *
  * Classic Charikar sketch: each token hashes to 64 bits; each bit
  * contributes +1/-1 to a per-bit tally; the sketch takes the signs. Near-
  * duplicate documents land within a small Hamming distance. Implemented
  * as array-fold expressions (`aggregate`/`zip_with`) — fully codegen'd,
  * no UDF, no shuffle until the (tiny) sketch column is grouped.
  */
object SimHash {

  /** +1/-1 per bit of a 64-bit hash, bit 0 first (statically unrolled). */
  private def bitVector(h: Column): Column =
    array((0 until 64).map { i =>
      when(shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L), lit(1)).otherwise(lit(-1))
    }: _*)

  /** 63-bit SimHash (bigint) of a token array: per-bit tallies are one
    * fold; packing is a second fold `acc*2 + sign-bit` from bit 62 down.
    * Hash bit 63 is dropped so the packed value stays in a positive long —
    * ANSI-mode-safe (no overflow) at the cost of one sketch bit. */
  def simhash(tokens: Column): Column = {
    val tallies = aggregate(
      tokens,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, t) => zip_with(acc, bitVector(xxhash64(t)), (a, b) => a + b)
    )
    aggregate(
      slice(reverse(tallies), 2, 63),
      lit(0L),
      (acc, v) => acc * lit(2L) + when(v > 0, lit(1L)).otherwise(lit(0L))
    )
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit slice `band` (0-3) of the sketch: near sketches share at least
    * one slice, used to bucket candidates without an O(n²) comparison. */
  def bandKey(h: Column, band: Int): Column =
    shiftright(h, band * 16).bitwiseAND(lit(0xFFFFL))
}
