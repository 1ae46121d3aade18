package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Fused native kernels for the embedding operators.
  *
  * The composed Column pipelines in [[graft.functions.VectorFunctions]]
  * (`zip_with` + `aggregate` folds) are codegen'd but still materialize an
  * intermediate array per fold — cosine allocates three (products, a², b²),
  * an LSH bucket one per hyperplane. These expressions walk the input
  * `ArrayData` once with zero allocation. Accumulation order matches the
  * composed sequential folds exactly (left-to-right, double precision), so
  * results are bit-identical — asserted in VectorExpressionsSpec — and the
  * DuckDB `list_reduce` oracles keep matching.
  */
object VectorKernels {

  // element-kind codes for the numeric array types the kernels read
  // directly (the composed folds cast any numeric element to double, so
  // the fused forms must accept the same inputs — an integer-quantized
  // embedding column is a legitimate caller)
  final val KFloat = 0
  final val KDouble = 1
  final val KInt = 2
  final val KLong = 3
  final val KShort = 4
  final val KByte = 5

  @inline private[expressions] def readD(a: ArrayData, i: Int, kind: Int): Double =
    kind match {
      case KFloat  => a.getFloat(i).toDouble
      case KDouble => a.getDouble(i)
      case KInt    => a.getInt(i).toDouble
      case KLong   => a.getLong(i).toDouble
      case KShort  => a.getShort(i).toDouble
      case _       => a.getByte(i).toDouble
    }

  /** Cosine similarity of two numeric arrays.
    * Mirrors `VectorFunctions.cosine`'s composed semantics: 0.0 when either
    * norm is zero; null when lengths differ or any element is null (the
    * composed `zip_with` pads with nulls, which poison the fold). */
  def cosine(a: ArrayData, b: ArrayData, aKind: Int, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var xy = 0.0
    var xx = 0.0
    var yy = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = readD(a, i, aKind)
      val y = readD(b, i, bKind)
      xy += x * y
      xx += x * x
      yy += y * y
      i += 1
    }
    val denom = Math.sqrt(xx) * Math.sqrt(yy)
    if (denom == 0.0) 0.0 else xy / denom
  }

  /** Dot product of two numeric arrays — the accumulation half of
    * [[cosine]]. Mirrors `VectorFunctions.dotComposed`'s semantics: null
    * when lengths differ (zip_with pads with nulls, which poison the
    * fold) or any element is null; 0.0 on empty arrays (the fold's
    * init). Left-to-right double-precision accumulation — bit-identical
    * to the composed fold. */
  def dot(a: ArrayData, b: ArrayData, aKind: Int, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var xy = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = readD(a, i, aKind)
      val y = readD(b, i, bKind)
      xy += x * y
      i += 1
    }
    xy
  }

  /** Sign-pattern LSH bucket: bit j = (v · plane_j >= 0). Mirrors the
    * composed `lshBucket`: any null element or dimension mismatch makes
    * every projection null, whose `when` falls to 0 — bucket 0. */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]], vKind: Int): Long = {
    val n = v.numElements()
    if (planes.length == 0) return 0L
    if (n != planes(0).length) return 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var proj = 0.0
      var k = 0
      while (k < n) {
        val x = readD(v, k, vKind)
        proj += x * p(k)
        k += 1
      }
      if (proj >= 0.0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Count of slot positions where two bigint arrays hold equal non-null
    * values. Mirrors the composed
    * `aggregate(zip_with(a, b, (x,y) => when(x === y, 1L).otherwise(0L)), 0L, _+_)`
    * exactly: `zip_with` pads the shorter array with nulls and a
    * null-vs-anything comparison falls to `otherwise(0)`, so slots beyond
    * the shorter length and null slots contribute 0 — i.e. only positions
    * below min(len) with equal non-null values count. */
  def slotAgreement(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        cnt += 1L
      i += 1
    }
    cnt
  }

  /** Ids of the `k` nearest centroids of `v` under cosine order,
    * best-first (score desc, centroid id asc on ties). `cents` holds the
    * PRE-NORMALIZED centroids (c/||c||, a zero centroid stays zero), so
    * the per-centroid score `dot(v, c/||c||)` shares v's norm as a common
    * positive factor with cosine — the argmax/top-k order is the cosine
    * order without ever computing ||v||. One pass over the centroid
    * matrix per row, bounded insertion into k-slot arrays: O(m·d + m·k)
    * with zero allocation beyond the k slots and the unpacked vector.
    *
    * Null when the vector is null, has a null element, or matches NO
    * centroid's dimensionality; a centroid whose dimension differs from
    * the vector's is skipped (the same per-pair behavior as the dot
    * kernel, which yields null for that pair — the old per-centroid
    * expression chain degraded the same way, and indexing past a short
    * centroid would otherwise throw mid-job on a mixed-dim corpus).
    * Empty array when there are no centroids. */
  def nearestCentroids(
      v: ArrayData,
      cents: Array[Array[Double]],
      ids: Array[Int],
      k: Int,
      vKind: Int): ArrayData = {
    val m = cents.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = readD(v, i, vKind)
      i += 1
    }
    val kk = math.min(k, m)
    val bs = new Array[Double](kk)
    val bi = new Array[Int](kk)
    var filled = 0
    var c = 0
    while (c < m) {
      val cv = cents(c)
      if (cv.length == n) {
        var s = 0.0
        var j = 0
        while (j < n) { s += x(j) * cv(j); j += 1 }
        val id = ids(c)
        if (filled < kk) {
          var p = filled
          while (p > 0 && (bs(p - 1) < s || (bs(p - 1) == s && bi(p - 1) > id))) {
            bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1
          }
          bs(p) = s; bi(p) = id
          filled += 1
        } else if (s > bs(kk - 1) || (s == bs(kk - 1) && id < bi(kk - 1))) {
          var p = kk - 1
          while (p > 0 && (bs(p - 1) < s || (bs(p - 1) == s && bi(p - 1) > id))) {
            bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1
          }
          bs(p) = s; bi(p) = id
        }
      }
      c += 1
    }
    if (filled == 0) return null
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) {
      out(o) = java.lang.Integer.valueOf(bi(o))
      o += 1
    }
    new GenericArrayData(out)
  }

  private[expressions] def elemKind(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _)   => KFloat
    case ArrayType(DoubleType, _)  => KDouble
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => KInt
    case ArrayType(LongType, _)    => KLong
    case ArrayType(org.apache.spark.sql.types.ShortType, _)   => KShort
    case ArrayType(org.apache.spark.sql.types.ByteType, _)    => KByte
    case other => throw new IllegalArgumentException(
      s"expected an array of a primitive numeric type, got ${other.simpleString}")
  }

  private[expressions] def isVectorType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType |
                   org.apache.spark.sql.types.IntegerType | LongType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.ByteType, _) => true
    case _ => false
  }

  /** Analysis-time type check shared by the vector kernels: a wrong input
    * type fails resolution with a clear message instead of surfacing as an
    * IllegalArgumentException at codegen/eval time. */
  private[expressions] def checkVectorInputs(
      name: String, inputs: (String, DataType)*): TypeCheckResult = {
    inputs.find { case (_, dt) => !isVectorType(dt) } match {
      case Some((arg, dt)) => TypeCheckResult.TypeCheckFailure(
        s"$name requires an array of a primitive numeric type for $arg, " +
          s"got ${dt.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** cosine(a, b) as one fused pass — see [[VectorKernels.cosine]]. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVectorInputs(prettyName,
      "left" -> left.dataType, "right" -> right.dataType)

  private lazy val lKind = VectorKernels.elemKind(left.dataType)
  private lazy val rKind = VectorKernels.elemKind(right.dataType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VectorKernels.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], lKind, rKind)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val boxed = ctx.freshName("cosBoxed")
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lGen.isNull} && !${rGen.isNull}) {
        java.lang.Double $boxed = graft.functions.expressions.VectorKernels.cosine(
          ${lGen.value}, ${rGen.value}, $lKind, $rKind);
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.doubleValue();
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) as one fused pass — see [[VectorKernels.dot]]. The hot core
  * of IVF centroid assignment (16+ dots per row: the composed
  * `aggregate(zip_with(...))` fold is interpreted per element and
  * allocates the zipped array per centroid per row). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVectorInputs(prettyName,
      "left" -> left.dataType, "right" -> right.dataType)

  private lazy val lKind = VectorKernels.elemKind(left.dataType)
  private lazy val rKind = VectorKernels.elemKind(right.dataType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VectorKernels.dot(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], lKind, rKind)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val boxed = ctx.freshName("dotBoxed")
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lGen.isNull} && !${rGen.isNull}) {
        java.lang.Double $boxed = graft.functions.expressions.VectorKernels.dot(
          ${lGen.value}, ${rGen.value}, $lKind, $rKind);
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.doubleValue();
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** slot-agreement count of two bigint arrays as one fused pass — see
  * [[VectorKernels.slotAgreement]]. The hot core of LSH candidate scoring:
  * the composed `aggregate(zip_with(...))` fold runs interpreted per slot
  * and allocates the zipped array per signature pair, and a band bucket of
  * m signatures evaluates it m(m-1)/2 times. */
case class SlotAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_slot_agreement"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    Seq("left" -> left.dataType, "right" -> right.dataType)
      .find { case (_, dt) => !ok(dt) } match {
      case Some((arg, dt)) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> for $arg, got ${dt.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.slotAgreement(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorKernels.slotAgreement($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hyperplane-sign LSH bucket as one fused pass over the vector — see
  * [[VectorKernels.lshBucket]]. The plane matrix is a driver-side constant
  * shipped as a codegen reference object (it is per-query, a few KB).
  * Planes are held as `Seq[Seq[Double]]` so case-class equality is
  * structural — `semanticEquals`/canonicalization/subexpression
  * elimination recognize two buckets over the same planes as the same
  * expression (a raw `Array` param compares by reference and defeats
  * all three). */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVectorInputs(prettyName, "input" -> child.dataType)

  private lazy val vKind = VectorKernels.elemKind(child.dataType)
  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshBucket(input.asInstanceOf[ArrayData], planesArr, vKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftLshPlanes", planesArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.VectorKernels.lshBucket($c, $planesRef, $vKind)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-k nearest centroid ids as one fused pass over a centroid matrix
  * shipped as a codegen reference object — see
  * [[VectorKernels.nearestCentroids]]. The IVF argmax/probe kernel: the
  * expression tree is O(1) in centroid count, so a 10⁵-centroid index
  * plans, constant-folds, and whole-stage-codegens exactly like a
  * 16-centroid one — where one `greatest(struct(dot(v, array(lit…))))`
  * branch per centroid grew the tree (and the generated method bodies)
  * linearly and broke codegen in the low hundreds. Zero shuffle: the
  * centroids ride the closure, not a join.
  *
  * Centroids are held as `Seq[(id, Seq[Double])]` so case-class equality
  * is structural — `semanticEquals`/canonicalization recognize two
  * kernels over the same centroids (a raw `Array` param compares by
  * reference and defeats subexpression elimination). Normalization
  * (c/||c||) happens once, lazily, driver-side. */
case class NearestCentroids(
    child: Expression,
    centroids: Seq[(Int, Seq[Double])],
    k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else
      VectorKernels.checkVectorInputs(prettyName, "input" -> child.dataType)

  private lazy val vKind = VectorKernels.elemKind(child.dataType)

  @transient private lazy val normed: Array[Array[Double]] =
    centroids.map { case (_, c) =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      (if (nrm == 0.0) c.map(_ => 0.0) else c.map(_ / nrm)).toArray
    }.toArray

  @transient private lazy val ids: Array[Int] = centroids.map(_._1).toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroids(
      input.asInstanceOf[ArrayData], normed, ids, k, vKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftIvfCentroids", normed, "double[][]")
    val idsRef = ctx.addReferenceObj("graftIvfCentroidIds", ids, "int[]")
    val res = ctx.freshName("ncRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res =
        graft.functions.expressions.VectorKernels.nearestCentroids(
          $c, $centsRef, $idsRef, $k, $vKind);
      if ($res == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $res;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
