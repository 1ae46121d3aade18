package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row whitespace-token frequency map: `token -> occurrences`, in one
  * pass over the bytes.
  *
  * This is the map-side half of a term-frequency aggregation, computed
  * inside the row instead of through an exchange: `explode(TokenCounts(t))`
  * yields exactly the rows `groupBy(id, term).count()` would after
  * exploding `wsTokens(t)` — one row per DISTINCT (row, token) with its
  * count — but the corpus-wide `(id, term)` shuffle and its
  * ObjectHashAggregate disappear entirely (term frequency is a
  * WITHIN-document statistic; no cross-partition merge is ever needed when
  * each input row is one document). Tokenization is the exact Java regex
  * `\s` separator set, byte-walked (ASCII-only whitespace: UTF-8
  * continuation bytes are >= 0x80 and never collide), matching
  * `wsTokens`'s `split(trim(c), "\\s+")` + non-empty filter — equivalence
  * asserted in TokenCountsSpec. Case folding stays OUTSIDE the kernel
  * (callers pass `lower(c)` — Spark's own `Lower`), so there is no second
  * lowercase implementation to drift.
  *
  * Map entries are in first-occurrence order (deterministic for a given
  * input). NULL input → NULL map; empty/whitespace-only input → empty map
  * (explodes to zero rows, like the composed explode of an empty token
  * array).
  */
/** The ONE definition of the byte-level whitespace set (Java regex `\s`:
  * space, tab, LF, VT, FF, CR) shared by every fused tokenizer kernel —
  * [[TokenCountsKernel]] and [[TokenSetCountsKernel]] must never drift
  * from each other or from `wsTokens`'s `split("\\s+")`. */
private[expressions] object WsBytes {
  @inline def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B
}

object TokenCountsKernel {

  import WsBytes.isSpace

  def counts(s: UTF8String): MapData = {
    val bytes = s.getBytes
    val n = bytes.length
    val acc = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        // absent unboxes to 0L, so this is insert-or-increment
        acc.put(tok, acc.get(tok) + 1L)
      }
    }
    val m = acc.size()
    val keys = new Array[Any](m)
    val values = new Array[Any](m)
    val it = acc.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      values(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}

/** `token -> count` of the whitespace tokens of a string, fused — see
  * [[TokenCountsKernel]]. */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_counts"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountsKernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenCountsKernel.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
