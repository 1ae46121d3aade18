package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Karp–Rabin rolling fingerprint
  * `h = h*257 + codepoint mod 1e9+7`, seeded with the first character's
  * code point.
  *
  * Equivalent to the composed pipeline in
  * [[graft.functions.TextFunctions.fingerprint]] (`split('')` →
  * per-character `ascii` → `aggregate` fold), which allocates one string
  * per character plus a codes array per row. This kernel walks the
  * UTF8String bytes once, decoding code points in place — zero allocation.
  * Pure integer arithmetic → bit-identical to the composed version and to
  * the DuckDB oracle (asserted in RollingFingerprintSpec).
  *
  * NULL input → NULL; empty string → 0L.
  */
case class RollingFingerprint(
    child: Expression,
    base: Long = 257L,
    mod: Long = 1000000007L) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.RollingFingerprint.compute($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {

  /** Static kernel (also called from generated code). Walks UTF-8 bytes,
    * decoding one code point per step — matches `ascii()` per character.
    * Parameterized base/mod so independent hash families (e.g.
    * [[graft.operators.SetSketch]]'s second fold) reuse the same
    * zero-allocation walk. */
  def compute(s: UTF8String, base: Long = 257L, mod: Long = 1000000007L): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    var h = -1L
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { len = 2; cp = b0 & 0x1F }
      else if ((b0 & 0xF0) == 0xE0) { len = 3; cp = b0 & 0x0F }
      else { len = 4; cp = b0 & 0x07 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (bytes(i + j) & 0x3F)
        j += 1
      }
      i += len
      h = if (h < 0) cp.toLong else (h * base + cp) % mod
    }
    if (h < 0) 0L else h
  }
}
