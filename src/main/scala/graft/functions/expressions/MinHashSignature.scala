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
  *
  * `sampleShift > 0` turns on CONTENT-DEFINED shingle sampling (sparse
  * MinHash): only windows whose first hash lands on a multiple of
  * `2^sampleShift` contribute — a deterministic 1/2^shift subset chosen
  * by shingle CONTENT, so two documents always sample the same shingle
  * universe (position-stride sampling would desynchronize on a shifted
  * copy and bias the Jaccard estimate down). Equal texts keep equal
  * signatures at any shift; the kernel cost drops to one hash per
  * window plus the full lane fold on the sampled 1/2^shift. A document
  * whose windows all miss the sample (short docs) falls back to the
  * full pass — never an empty signature. `sampleShift = 0` is
  * bit-identical to the unsampled kernel.
  */
case class MinHashSignature(
    child: Expression, k: Int, numHashes: Int, sampleShift: Int = 0)
    extends UnaryExpression {

  require(k > 0, "shingle size k must be positive")
  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in [1, 1024]")
  require(sampleShift >= 0 && sampleShift < 20, "sampleShift must be in [0, 20)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], k, numHashes,
      sampleShift)

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
        $arrCls $arr = $obj.compute(${childGen.value}, $k, $numHashes, $sampleShift);
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
  def compute(s: UTF8String, k: Int, numHashes: Int): ArrayData =
    compute(s, k, numHashes, 0)

  def compute(s: UTF8String, k: Int, numHashes: Int, sampleShift: Int): ArrayData = {
    val bytes = s.getBytes
    val windows = bytes.length - k + 1
    if (windows <= 0) return null
    // content-defined sampling: a window contributes iff its first hash
    // is ≡ 0 mod 2^shift — shift 0 makes the mask 0, every window
    // passes, and the loop is byte-identical to the unsampled kernel
    val sampleMask = (1L << sampleShift) - 1L
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var sampled = 0
    var i = 0
    while (i < windows) {
      val off = Platform.BYTE_ARRAY_OFFSET + i
      val h1 = XXH64.hashUnsafeBytes(bytes, off, k, 42L)
      if ((h1 & sampleMask) == 0L) {
        sampled += 1
        val h2 = XXH64.hashUnsafeBytes(bytes, off, k, 1337L)
        // two's-complement residue mod a power of two is a mask, for
        // negative inputs too: identical to ((h % M) + M) % M
        val a = h1 & Mask
        val b = (h2 & Mask) | 1L
        // Four independent stride-4b accumulators instead of one
        // dependent add chain: lane j's closed form (a + j·b) mod 2^45
        // is preserved EXACTLY (addition mod a power of two is
        // associative, and 4b & Mask ≡ 4b mod M), but the loop-carried
        // dependency shrinks from 48 sequential add→mask→compare steps
        // to 12 per chain — the lane fold was the measured hot half of
        // the 100× signature stage, and the chains retire in parallel.
        val b4 = (b << 2) & Mask
        var h0 = a
        var hA = (a + b) & Mask
        var hB = (hA + b) & Mask
        var hC = (hB + b) & Mask
        var j = 0
        val lim = numHashes - 3
        while (j < lim) {
          if (h0 < sig(j)) sig(j) = h0
          if (hA < sig(j + 1)) sig(j + 1) = hA
          if (hB < sig(j + 2)) sig(j + 2) = hB
          if (hC < sig(j + 3)) sig(j + 3) = hC
          h0 = (h0 + b4) & Mask
          hA = (hA + b4) & Mask
          hB = (hB + b4) & Mask
          hC = (hC + b4) & Mask
          j += 4
        }
        while (j < numHashes) {
          // closed-form tail: j·b ≤ 1023·2^45 < 2^63, no overflow
          val h = (a + j.toLong * b) & Mask
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    // a short document can miss the sample entirely — fall back to the
    // full pass rather than emit an all-MaxValue signature that would
    // spuriously collide every such document into one group
    if (sampled == 0) return compute(s, k, numHashes, 0)
    new GenericArrayData(sig)
  }
}
