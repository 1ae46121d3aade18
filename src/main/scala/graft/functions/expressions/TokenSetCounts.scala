package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass whitespace tokenization + membership counting against small
  * word sets.
  *
  * The composed language-ID / quality-score pipeline re-tokenizes the
  * document once per language profile plus twice for the stopword ratio —
  * seven `split` + higher-order `filter` passes per row, each allocating a
  * token array (the dominant cost of the curation gate at 20× scale).
  * This kernel lowercases once (Spark `lower` semantics —
  * `UTF8String.toLowerCase`), walks the bytes once with the exact Java
  * regex `\s` separator set (ASCII-only, multibyte-safe: UTF-8
  * continuation bytes never collide with ASCII whitespace), and counts
  * every set's members plus the total token count in that single pass.
  *
  * Token counts are integers and membership is exact byte equality of the
  * lowercased token, so the result is bit-identical to the composed
  * `size(filter(wsTokens(lower(c)), isin(words)))` — asserted in
  * TokenSetCountsSpec. (Total tokens are counted on the LOWERCASED text;
  * lowercasing cannot create or destroy whitespace, so this equals the
  * composed `size(wsTokens(c))` denominator.)
  */
object TokenSetCountsKernel {

  import WsBytes.isSpace // the shared `\s` byte set — one definition

  /** Compiled form of the word sets: for each distinct token length, the
    * (wordBytes, setIndex) pairs of that length. Tiny (tens of words). */
  final class Compiled(sets: Seq[Seq[String]]) extends Serializable {
    val numSets: Int = sets.length
    // length -> array of (bytes, setIdx); a word appearing in several sets
    // contributes one entry per set
    val byLen: Map[Int, Array[(Array[Byte], Int)]] = sets.zipWithIndex
      .flatMap { case (words, si) =>
        words.map(w => (w.getBytes(java.nio.charset.StandardCharsets.UTF_8), si))
      }
      .groupBy(_._1.length)
      .map { case (len, entries) => len -> entries.toArray }
  }

  private def tokenMatches(bytes: Array[Byte], start: Int, word: Array[Byte]): Boolean = {
    var k = 0
    while (k < word.length) {
      if (bytes(start + k) != word(k)) return false
      k += 1
    }
    true
  }

  /** [totalTokens, countSet0, countSet1, ...] over the lowercased text. */
  def counts(s: UTF8String, compiled: Compiled): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val out = new Array[Int](compiled.numSets + 1)
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        out(0) += 1
        compiled.byLen.get(i - start) match {
          case Some(entries) =>
            var e = 0
            while (e < entries.length) {
              if (tokenMatches(bytes, start, entries(e)._1)) out(entries(e)._2 + 1) += 1
              e += 1
            }
          case None => ()
        }
      }
    }
    new GenericArrayData(out.map(x => x: Any))
  }
}

/** `[total, |tokens ∩ set_0|, ...]` in one pass — see
  * [[TokenSetCountsKernel]]. Sets are `Seq[Seq[String]]` so case-class
  * equality is structural (semanticEquals / subexpression elimination
  * recognize two counts over the same sets). */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  require(sets.nonEmpty, "at least one word set required")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_set_counts"

  @transient private lazy val compiled = new TokenSetCountsKernel.Compiled(sets)

  override protected def nullSafeEval(input: Any): Any =
    TokenSetCountsKernel.counts(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTokenSets", compiled,
      classOf[TokenSetCountsKernel.Compiled].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenSetCountsKernel.counts($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
