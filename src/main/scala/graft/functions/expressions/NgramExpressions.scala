package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram kernels.
  *
  * The composed forms (`wsTokens` → `transform(sequence(...), concat_ws
  * (slice(...)))` → `array_distinct`) build one string per gram plus
  * intermediate arrays per row — the round-2 bench showed them dominating
  * the text-pipeline queries. These kernels tokenize the UTF8String's
  * bytes once (ASCII whitespace runs — the exact `\s+` set), hash token
  * windows, and count/emit distinct grams with an open-addressing table
  * whose collisions are verified by comparing the underlying token bytes —
  * so distinctness is EXACT string distinctness (tokens contain no spaces,
  * hence space-joining is injective), never hash-trusting. Equivalence
  * with the composed forms is asserted in NgramExpressionsSpec.
  */
object NgramKernels {

  // the ONE whitespace set every fused tokenizer kernel shares (Java
  // regex `\s`: space, tab, LF, VT, FF, CR — ASCII-only, multibyte-safe)
  import WsBytes.isSpace

  /** Returns packed token offsets: even slots start, odd slots end. */
  private[expressions] def tokenizeBytes(bytes: Array[Byte]): (Array[Int], Int) = {
    val n = bytes.length
    var cap = 16
    var offs = new Array[Int](cap * 2)
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (count == cap) {
          cap *= 2
          offs = java.util.Arrays.copyOf(offs, cap * 2)
        }
        offs(count * 2) = start
        offs(count * 2 + 1) = i
        count += 1
      }
    }
    (offs, count)
  }

  /** Byte equality of gram windows [i, i+n) and [j, j+n). */
  private def gramEq(bytes: Array[Byte], offs: Array[Int], i: Int, j: Int, n: Int): Boolean = {
    var t = 0
    while (t < n) {
      val as = offs((i + t) * 2); val ae = offs((i + t) * 2 + 1)
      val bs = offs((j + t) * 2); val be = offs((j + t) * 2 + 1)
      if (ae - as != be - bs) return false
      var k = 0
      val len = ae - as
      while (k < len) {
        if (bytes(as + k) != bytes(bs + k)) return false
        k += 1
      }
      t += 1
    }
    true
  }

  /** For each gram start index, its slot in an open-addressing table keyed
    * by window hash with byte-verified equality. Returns the first-seen
    * gram index per distinct gram, -1 sentinel in `table` for empty. */
  private def distinctGramIndices(
      bytes: Array[Byte], offs: Array[Int], tokens: Int, n: Int): Array[Int] = {
    val total = tokens - n + 1
    // per-token hashes once
    val th = new Array[Long](tokens)
    var t = 0
    while (t < tokens) {
      th(t) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + offs(t * 2), offs(t * 2 + 1) - offs(t * 2), 42L)
      t += 1
    }
    var cap = java.lang.Integer.highestOneBit(math.max(total * 2 - 1, 4)) * 2
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    val firstSeen = new Array[Int](total) // distinct gram start indices, packed
    var nDistinct = 0
    var i = 0
    while (i < total) {
      var h = th(i)
      var w = 1
      while (w < n) { h = XXH64.hashLong(th(i + w), h); w += 1 }
      var slot = (h & (cap - 1)).toInt
      var placed = false
      while (!placed) {
        val occ = table(slot)
        if (occ == -1) {
          table(slot) = i
          firstSeen(nDistinct) = i
          nDistinct += 1
          placed = true
        } else if (gramEq(bytes, offs, occ, i, n)) {
          placed = true // duplicate
        } else {
          slot = (slot + 1) & (cap - 1)
        }
      }
      i += 1
    }
    java.util.Arrays.copyOf(firstSeen, nDistinct)
  }

  /** Duplicate-gram fraction: 1 - distinct/total; 0.0 when total <= 0. */
  def dupFraction(s: UTF8String, n: Int): Double = {
    val bytes = s.getBytes
    val (offs, tokens) = tokenizeBytes(bytes)
    val total = tokens - n + 1
    if (total <= 0) return 0.0
    val distinct = distinctGramIndices(bytes, offs, tokens, n).length
    1.0 - distinct.toDouble / total.toDouble
  }

  /** Distinct space-joined n-grams in first-occurrence order (the
    * `array_distinct` contract). Empty array when total <= 0. */
  def distinctNgrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val (offs, tokens) = tokenizeBytes(bytes)
    val total = tokens - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val idx = distinctGramIndices(bytes, offs, tokens, n)
    val out = new Array[Any](idx.length)
    var g = 0
    while (g < idx.length) {
      val i = idx(g)
      var len = n - 1
      var t = 0
      while (t < n) { len += offs((i + t) * 2 + 1) - offs((i + t) * 2); t += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      t = 0
      while (t < n) {
        val s0 = offs((i + t) * 2); val e0 = offs((i + t) * 2 + 1)
        System.arraycopy(bytes, s0, buf, pos, e0 - s0)
        pos += e0 - s0
        if (t < n - 1) { buf(pos) = ' '; pos += 1 }
        t += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** 128-bit hash pair for EVERY k-token window, in window order (r15) —
  * the [[graft.operators.Dedup.dropSharedSpans]] occurrence kernel. The
  * composed form built one space-joined string per window (slice +
  * concat_ws: two allocations and an O(window bytes) copy+hash each —
  * measured as the dominant cost of the 20× span-dedup occ stage);
  * this hashes each token's bytes ONCE per seed and chains the window
  * hash over the k token hashes with `XXH64.hashLong` — O(k) cheap long
  * mixes per window, zero allocation beyond the output. Window equality
  * is equal TOKEN SEQUENCES (each token hashed length-aware), exactly
  * the space-joined string equality (tokens contain no whitespace, so
  * joining is injective); two independent 64-bit chains put a collision
  * at ~2⁻¹²⁸ — the established fused-minhash surrogate argument. */
object WindowHashKernel {

  def windowHashPairs(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val (offs, tokens) = NgramKernels.tokenizeBytes(bytes)
    val total = tokens - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val th1 = new Array[Long](tokens)
    val th2 = new Array[Long](tokens)
    var t = 0
    while (t < tokens) {
      val off = Platform.BYTE_ARRAY_OFFSET + offs(t * 2)
      val len = offs(t * 2 + 1) - offs(t * 2)
      th1(t) = XXH64.hashUnsafeBytes(bytes, off, len, 42L)
      th2(t) = XXH64.hashUnsafeBytes(bytes, off, len, 0x9E3779B97F4A7C15L)
      t += 1
    }
    val out = new Array[Any](total)
    var i = 0
    while (i < total) {
      var h1 = th1(i)
      var h2 = th2(i)
      var w = 1
      while (w < n) {
        h1 = XXH64.hashLong(th1(i + w), h1)
        h2 = XXH64.hashLong(th2(i + w), h2)
        w += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** window-hash pairs for all k-token windows — see
  * [[WindowHashKernel.windowHashPairs]]. */
case class WordWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h1",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h2",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashKernel.windowHashPairs(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.WindowHashKernel.windowHashPairs($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** duplicate word-n-gram fraction — see [[NgramKernels.dupFraction]]. */
case class DuplicateNgramFraction(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dup_ngram_fraction"

  override protected def nullSafeEval(input: Any): Any =
    NgramKernels.dupFraction(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NgramKernels.dupFraction($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** distinct word-n-grams — see [[NgramKernels.distinctNgrams]]. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    NgramKernels.distinctNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NgramKernels.distinctNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
