package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 63-bit SimHash of a string's whitespace
  * tokens in one pass over the bytes.
  *
  * The composed Column pipeline (wsTokens → per-token 64 `when` exprs →
  * two array folds in [[graft.functions.SimHash]]) allocates a token array
  * and evaluates 64 branch expressions per token. This kernel walks the
  * UTF8String bytes once: token boundaries are ASCII whitespace runs, each
  * token is hashed in place with `XXH64` over its byte range, and the 64
  * tally counters update in an unrolled loop. Packing drops hash bit 63 so
  * the sketch stays a non-negative long (matching the composed version's
  * ANSI-safe semantics — same sketch width, different hash inputs).
  *
  * NULL input → NULL; a string with no tokens → 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  // the ONE whitespace set every fused tokenizer kernel shares
  import WsBytes.isSpace

  /** Static kernel (also called from generated code). */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val tally = new Array[Int](64)
    var i = 0
    var sawToken = false
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        sawToken = true
        val h = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
          j += 1
        }
      }
    }
    if (!sawToken) return 0L
    var out = 0L
    var j = 62
    while (j >= 0) {
      out = out * 2 + (if (tally(j) > 0) 1L else 0L)
      j -= 1
    }
    out
  }
}
