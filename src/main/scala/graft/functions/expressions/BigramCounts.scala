package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row whitespace-token BIGRAM frequency map: `"w1 w2" -> occurrences`,
  * in one pass over the bytes — the [[TokenCountsKernel]] pattern applied
  * to adjacent token pairs.
  *
  * This is the map-side half of a bigram-count aggregation computed inside
  * the row: `explode(BigramCounts(t))` yields one row per DISTINCT
  * (row, bigram) with its within-document count, so the corpus-wide
  * (id, bigram) shuffle that `explode(bigrams) + groupBy(id, bigram)
  * .count()` would need disappears (bigram frequency is a WITHIN-document
  * statistic). Tokenization is byte-identical to [[TokenCountsKernel]]
  * (the shared [[WsBytes]] whitespace set); the bigram key is the two
  * tokens joined by a single ASCII space — tokens cannot contain
  * whitespace, so the key is unambiguous and `substring_index(key, ' ', 1)`
  * recovers the left context exactly. Case folding stays OUTSIDE the
  * kernel (callers pass `lower(c)`).
  *
  * Map entries are in first-occurrence order (deterministic for a given
  * input). NULL input → NULL map; inputs with fewer than two tokens → empty
  * map (explodes to zero rows, matching the composed adjacent-pair build
  * over the token array).
  */
object BigramCountsKernel {

  import WsBytes.isSpace

  def counts(s: UTF8String): MapData = {
    val bytes = s.getBytes
    val n = bytes.length
    val acc = new java.util.LinkedHashMap[UTF8String, Long]()
    var prevStart = -1
    var prevLen = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (prevStart >= 0) {
          val len = i - start
          val b = new Array[Byte](prevLen + 1 + len)
          System.arraycopy(bytes, prevStart, b, 0, prevLen)
          b(prevLen) = ' '
          System.arraycopy(bytes, start, b, prevLen + 1, len)
          val bg = UTF8String.fromBytes(b)
          // absent unboxes to 0L, so this is insert-or-increment
          acc.put(bg, acc.get(bg) + 1L)
        }
        prevStart = start
        prevLen = i - start
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

/** `"w1 w2" -> count` of adjacent whitespace-token pairs, fused — see
  * [[BigramCountsKernel]]. */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    BigramCountsKernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.BigramCountsKernel.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
