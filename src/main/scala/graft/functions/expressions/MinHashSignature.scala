package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fused byte-level shingling + MinHash
  * signature of a string column.
  *
  * The composed Column pipeline (charShingles → hashPairs →
  * signatureFromPairs in [[graft.functions.MinHash]]) materializes ~len
  * shingle strings and a hash-pair array per row. This expression slides a
  * k-byte window over the UTF8String's bytes directly — zero string or
  * array allocation per shingle — computing `XXH64` twice per window and
  * folding the Kirsch–Mitzenmacher family mins in one tight loop. Registered
  * whole-stage-codegen-friendly: `doGenCode` emits a single static call, so
  * the surrounding operator pipeline stays fused.
  *
  * Duplicate shingles need no dedup: duplicates cannot change a min.
  *
  * Semantics: signature slot j = min over byte windows of
  * `(a + j*b) mod 2^45` with `a = xxh64(window, seed 42) mod 2^45`,
  * `b = xxh64(window, seed 1337) mod 2^45, forced odd`. NULL when the
  * input is NULL or shorter than k bytes.
  */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k > 0, "shingle size k must be positive")
  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in [1, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val obj = "graft.functions.expressions.MinHashSignature"
    val arrCls = classOf[ArrayData].getName
    val arr = ctx.freshName("mhSig")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $arrCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        $arrCls $arr = $obj.compute(${childGen.value}, $k, $numHashes);
        if ($arr != null) {
          ${ev.isNull} = false;
          ${ev.value} = $arr;
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  private val M = 1L << 45
  private val Mask = M - 1

  /** Static kernel (also called from generated code). Returns null when
    * fewer than one k-byte window exists.
    *
    * The lane loop computes `(a + j*b) mod 2^45` incrementally: M is a
    * power of two, so the mod is a mask, and the affine stride is one
    * add-and-mask per lane (`h_{j} = (h_{j-1} + b) & Mask` — a and b are
    * already reduced below 2^45, so the sum never overflows and the
    * values are IDENTICAL to the closed form, just without the per-lane
    * 64-bit multiply and modulo that dominated the signature stage). */
  def compute(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val bytes = s.getBytes
    val windows = bytes.length - k + 1
    if (windows <= 0) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < windows) {
      val off = Platform.BYTE_ARRAY_OFFSET + i
      val h1 = XXH64.hashUnsafeBytes(bytes, off, k, 42L)
      val h2 = XXH64.hashUnsafeBytes(bytes, off, k, 1337L)
      // two's-complement residue mod a power of two is a mask, for
      // negative inputs too: identical to ((h % M) + M) % M
      val a = h1 & Mask
      val b = (h2 & Mask) | 1L
      var h = a
      var j = 0
      while (j < numHashes) {
        if (h < sig(j)) sig(j) = h
        h = (h + b) & Mask
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
