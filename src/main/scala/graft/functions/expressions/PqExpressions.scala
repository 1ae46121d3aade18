package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
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

  /** Residual-ADC score (IVFADC proper, Jégou et al. 2011 §IV-A): the
    * candidate reconstructs as `centroid_c + Σ_s book_s[code_s]` (codes
    * encode the RESIDUAL x − centroid), so
    * `⟨q, y⟩ = qdotc + Σ_s lut[s·ksub + code_s]` and
    * `||y||² = ||centroid||² + Σ_s (2·⟨centroid_s, cw⟩ + ||cw||²)` —
    * the centroid-codeword cross dots are a per-cluster table computed
    * once at expression construction (ncent · m · ksub doubles), so the
    * per-candidate cost stays m lookups. Score = ⟨q,y⟩/||y|| =
    * cos(q,y)·||q|| — rank-equivalent per query, same normalization
    * argument as [[adcScore]]. Null contract matches [[adcScore]], plus
    * null on a cluster id with no cross table (codes from an index this
    * expression's centroids don't describe must not silently
    * mis-score). */
  def adcResidualScore(
      lutArr: ArrayData,
      codes: ArrayData,
      cluster: Int,
      qdotc: Double,
      cnorm2: Array[Array[Double]],
      cross: Array[Array[Double]],
      centNorm2: Array[Double],
      ksub: Int): java.lang.Double = {
    val m = cnorm2.length
    if (cluster < 0 || cluster >= cross.length || cross(cluster) == null)
      return null
    if (codes.numElements() != m || lutArr.numElements() != m * ksub)
      return null
    val cx = cross(cluster)
    var sum = qdotc
    var n2 = centNorm2(cluster)
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      if (lutArr.isNullAt(s * ksub + c)) return null
      sum += lutArr.getDouble(s * ksub + c)
      n2 += 2.0 * cx(s * ksub + c) + cnorm2(s)(c)
      s += 1
    }
    if (n2 <= 0.0) 0.0 else sum / Math.sqrt(n2)
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

/** Residual-ADC score (IVFADC) of (query LUT, residual codes, cluster id,
  * ⟨query, centroid⟩) — see [[PqKernels.adcResidualScore]]. Codebook
  * norms, per-cluster centroid norms, and the per-cluster
  * centroid×codeword cross tables all ride as codegen reference objects
  * (sized ncent·m·ksub — index geometry, not corpus); the hot join-side
  * work stays m lookups per candidate. `centroids` joins the structural
  * equality contract so two kernels over the same geometry unify. */
case class PqAdcResidualScore(
    first: Expression,
    second: Expression,
    third: Expression,
    fourth: Expression,
    books: Seq[Seq[Seq[Double]]],
    centroids: Seq[(Int, Seq[Double])])
    extends QuaternaryExpression with PqCodebookExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc_residual"

  override def checkInputDataTypes(): TypeCheckResult =
    checkBooks(prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
          case (ArrayType(DoubleType, _), ArrayType(IntegerType, _),
                IntegerType, DoubleType) =>
            if (centroids.isEmpty)
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName requires at least one centroid")
            else if (books.nonEmpty && centroids.exists(
                _._2.size != books.size * books.head.head.size))
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName centroid dim must equal m·dsub = " +
                  s"${books.size * books.head.head.size}")
            else TypeCheckResult.TypeCheckSuccess
          case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (array<double> lut, array<int> codes, " +
              s"int cluster, double qdotc), got (${a.simpleString}, " +
              s"${b.simpleString}, ${c.simpleString}, ${d.simpleString})")
        }
      case f => f
    }

  /** cross(cid)(s·ksub + c) = ⟨centroid_cid[s·dsub ..], book_s[c]⟩ and
    * centNorm2(cid) = ||centroid_cid||², indexed directly by cluster id
    * (ids are small ints from ivfBuild; gaps hold null / 0 and score
    * null via the kernel's range check). */
  @transient private lazy val (crossArr, centNorm2Arr):
      (Array[Array[Double]], Array[Double]) = {
    val m = books.size
    val ks = ksub
    val dsub = if (m == 0) 0 else books.head.head.size
    val maxId = centroids.map(_._1).max
    val cross = new Array[Array[Double]](maxId + 1)
    val n2 = new Array[Double](maxId + 1)
    centroids.foreach { case (cid, cv) =>
      val cvArr = cv.toArray
      n2(cid) = cvArr.foldLeft(0.0)((a, x) => a + x * x)
      val t = new Array[Double](m * ks)
      var s = 0
      while (s < m) {
        val book = booksArr(s)
        val off = s * dsub
        var c = 0
        while (c < book.length) {
          val cw = book(c)
          var d = 0.0
          var j = 0
          while (j < dsub) { d += cvArr(off + j) * cw(j); j += 1 }
          t(s * ks + c) = d
          c += 1
        }
        s += 1
      }
      cross(cid) = t
    }
    (cross, n2)
  }

  override protected def nullSafeEval(
      lutArr: Any, codes: Any, cluster: Any, qdotc: Any): Any =
    PqKernels.adcResidualScore(
      lutArr.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cluster.asInstanceOf[Int], qdotc.asInstanceOf[Double],
      cnorm2Arr, crossArr, centNorm2Arr, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n2Ref = ctx.addReferenceObj("graftPqNorm2", cnorm2Arr, "double[][]")
    val crossRef = ctx.addReferenceObj("graftPqCross", crossArr, "double[][]")
    val centRef = ctx.addReferenceObj("graftPqCentN2", centNorm2Arr, "double[]")
    val boxed = ctx.freshName("adcResBoxed")
    nullSafeCodeGen(ctx, ev, (l, co, cl, qd) => s"""
      java.lang.Double $boxed =
        graft.functions.expressions.PqKernels.adcResidualScore(
          $l, $co, $cl, $qd, $n2Ref, $crossRef, $centRef, $ksub);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.doubleValue();
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
