package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou, Douze, Schmid 2011: "Product
  * Quantization for Nearest Neighbor Search"). A d-dim vector splits into
  * `m` contiguous subvectors of `dsub = d/m` dims; each subvector encodes
  * as the index of its nearest (L2) codeword in that subspace's
  * `ksub`-entry codebook — m small ints replace d floats (m bytes vs 4d
  * at ksub ≤ 256: a 16–64× memory cut, the standard 100 TB ANN storage
  * story beyond scalar int8's 4×).
  *
  * Search uses ADC (asymmetric distance computation): the QUERY stays
  * exact; per query a lookup table of `dot(q_s, codeword)` over all
  * m × ksub codewords is computed ONCE ([[PqLut]]), and scoring a
  * candidate is then m table lookups ([[PqAdcScore]]) instead of a d-dim
  * dot — O(m) per (query, candidate) pair.
  *
  * All three kernels follow the [[NearestCentroids]] shape: the codebook
  * matrix rides the expression as a codegen reference object (plan size
  * O(1) in ksub), held as nested `Seq`s so case-class equality is
  * structural and subexpression elimination works. Accumulation is
  * left-to-right double precision, matching the composed-fold semantics
  * the DuckDB oracles replay.
  */
object PqKernels {

  /** Encode: per subspace the argmin-L2 codeword index (tie → lowest
    * code). `books` is m × ksub × dsub. Null when the vector is null,
    * holds a null element, or its dimension ≠ m·dsub. Minimizing
    * `||x_s - c||² = ||x_s||² - 2⟨x_s,c⟩ + ||c||²` drops the common
    * `||x_s||²`, so the scan accumulates only `⟨x_s,c⟩` against the
    * precomputed `||c||²` — one multiply-add per codeword element. */
  def encode(
      v: ArrayData,
      books: Array[Array[Array[Double]]],
      cnorm2: Array[Array[Double]],
      vKind: Int): ArrayData = {
    val m = books.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val dsub = books(0)(0).length
    val n = v.numElements()
    if (n != m * dsub) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = VectorKernels.readD(v, i, vKind)
      i += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val n2 = cnorm2(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var dotv = 0.0
        var j = 0
        while (j < dsub) { dotv += x(off + j) * cw(j); j += 1 }
        val dist = n2(c) - 2.0 * dotv
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = java.lang.Integer.valueOf(best)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table: flat m·ksub doubles,
    * `lut[s·ksub + c] = ⟨q_s, book_s[c]⟩`. Null on null/mis-dimensioned
    * queries (same contract as [[encode]]). */
  def lut(
      q: ArrayData,
      books: Array[Array[Array[Double]]],
      vKind: Int): ArrayData = {
    val m = books.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val ksub = books(0).length
    val dsub = books(0)(0).length
    val n = q.numElements()
    if (n != m * dsub) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      x(i) = VectorKernels.readD(q, i, vKind)
      i += 1
    }
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var dotv = 0.0
        var j = 0
        while (j < dsub) { dotv += x(off + j) * cw(j); j += 1 }
        out(s * ksub + c) = dotv
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC cosine of (exact query, PQ-reconstructed candidate):
    * `Σ_s lut[s·ksub + code_s]` over `sqrt(Σ_s ||book_s[code_s]||²)` —
    * the query's own norm is a common positive per-query factor, so
    * ranking is unchanged without it (the [[NearestCentroids]]
    * normalized-dot argument). 0.0 when the reconstruction has zero
    * norm; null on null inputs, a code out of [0, ksub), or a LUT of
    * unexpected length (a lut/codes pair from DIFFERENT codebooks must
    * not silently mis-score). */
  def adcScore(
      lutArr: ArrayData,
      codes: ArrayData,
      cnorm2: Array[Array[Double]],
      ksub: Int): java.lang.Double = {
    val m = cnorm2.length
    if (codes.numElements() != m || lutArr.numElements() != m * ksub)
      return null
    var sum = 0.0
    var n2 = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      if (lutArr.isNullAt(s * ksub + c)) return null
      sum += lutArr.getDouble(s * ksub + c)
      n2 += cnorm2(s)(c)
      s += 1
    }
    if (n2 == 0.0) 0.0 else sum / Math.sqrt(n2)
  }
}

/** Shared structural codebook payload for the PQ expressions: nested
  * `Seq`s (m × ksub × dsub) keep case-class equality structural —
  * semanticEquals / subexpression elimination recognize two kernels over
  * the same codebooks. The derived arrays are lazy and `@transient`. */
trait PqCodebookExpression {
  def books: Seq[Seq[Seq[Double]]]

  @transient protected lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  @transient protected lazy val cnorm2Arr: Array[Array[Double]] =
    books.map(_.map(cw => cw.foldLeft(0.0)((a, x) => a + x * x)).toArray).toArray

  protected def ksub: Int = if (books.isEmpty) 0 else books.head.size

  protected def checkBooks(name: String): TypeCheckResult = {
    val ks = books.map(_.size).distinct
    val ds = books.flatMap(_.map(_.size)).distinct
    if (books.nonEmpty && (ks.size != 1 || ds.size != 1))
      TypeCheckResult.TypeCheckFailure(
        s"$name requires rectangular codebooks (uniform ksub and dsub), " +
          s"got ksub=$ks dsub=$ds")
    else TypeCheckResult.TypeCheckSuccess
  }
}

/** PQ codes (array<int>, length m) of a vector — see [[PqKernels.encode]]. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqCodebookExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    checkBooks(prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorKernels.checkVectorInputs(prettyName, "input" -> child.dataType)
      case f => f
    }

  private lazy val vKind = VectorKernels.elemKind(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], booksArr, cnorm2Arr, vKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("graftPqBooks", booksArr, "double[][][]")
    val n2Ref = ctx.addReferenceObj("graftPqNorm2", cnorm2Arr, "double[][]")
    val res = ctx.freshName("pqRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res =
        graft.functions.expressions.PqKernels.encode(
          $c, $booksRef, $n2Ref, $vKind);
      if ($res == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $res;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table (flat array<double>, m·ksub) — see
  * [[PqKernels.lut]]. Computed once per QUERY row, below the
  * query × candidate join. */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqCodebookExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    checkBooks(prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorKernels.checkVectorInputs(prettyName, "input" -> child.dataType)
      case f => f
    }

  private lazy val vKind = VectorKernels.elemKind(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], booksArr, vKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("graftPqBooks", booksArr, "double[][][]")
    val res = ctx.freshName("pqLut")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res =
        graft.functions.expressions.PqKernels.lut($c, $booksRef, $vKind);
      if ($res == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $res;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score of (query LUT, candidate codes) — see [[PqKernels.adcScore]].
  * The codebook NORMS ride as the reference object; the per-query dots
  * arrive via the LUT column, so the hot join-side work is m lookups. */
case class PqAdcScore(
    left: Expression,
    right: Expression,
    books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with PqCodebookExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    checkBooks(prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        (left.dataType, right.dataType) match {
          case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
            TypeCheckResult.TypeCheckSuccess
          case (l, r) => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (array<double> lut, array<int> codes), " +
              s"got (${l.simpleString}, ${r.simpleString})")
        }
      case f => f
    }

  override protected def nullSafeEval(lutArr: Any, codes: Any): Any =
    PqKernels.adcScore(lutArr.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], cnorm2Arr, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n2Ref = ctx.addReferenceObj("graftPqNorm2", cnorm2Arr, "double[][]")
    val boxed = ctx.freshName("adcBoxed")
    nullSafeCodeGen(ctx, ev, (l, r) => s"""
      java.lang.Double $boxed =
        graft.functions.expressions.PqKernels.adcScore(
          $l, $r, $n2Ref, $ksub);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.doubleValue();
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
