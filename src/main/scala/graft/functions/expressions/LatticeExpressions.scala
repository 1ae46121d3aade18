package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Exact integer-lattice L2 argmin over a centroid matrix — the
  * assignment kernel of [[graft.operators.KMeans]]. A first cut composed
  * this from `aggregate`/`zip_with`, but Spark's higher-order functions
  * are `CodegenFallback` (interpreted lambda dispatch per element,
  * ~0.35 ms/row against a k=8, d=64 literal matrix — measured, and the
  * fold re-ran under the downstream `posexplode`), which is two orders
  * off what a 100 TB refinement pass can afford. Same compiled-kernel
  * shape as [[VectorKernels.nearestCentroids]]: the centroid matrix
  * rides as a codegen reference object (plan size O(1)), one tight
  * multiply-add loop per row.
  */
object LatticeKernels {

  /** Argmin of exact long L2; ties to the LOWEST cid (strict `<` over a
    * cid-ascending scan — callers pass `cents`/`ids` sorted by cid).
    * Null for a null/mis-dimensioned vector or a null element. Distances
    * are exact longs — callers keep |x|, |c| small enough that
    * d·(x−c)² fits (the lattice contract). */
  def nearestLattice(
      v: ArrayData,
      cents: Array[Array[Long]],
      ids: Array[Int]): Any = {
    val m = cents.length
    if (m == 0) return null
    val d = cents(0).length
    if (v.numElements() != d) return null
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      x(i) = v.getLong(i)
      i += 1
    }
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < m) {
      val cv = cents(c)
      var dist = 0L
      var j = 0
      while (j < d) {
        val t = x(j) - cv(j)
        dist += t * t
        j += 1
      }
      if (dist < bestD) { bestD = dist; best = ids(c) }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }

  /** Minimum exact long L2 distance to any centroid — the D²(x, C) of
    * k-means‖ seeding ([[graft.operators.KMeans.parallelSeeds]]). Same
    * contract as [[nearestLattice]]: null for a null/mis-dimensioned
    * vector or a null element. */
  def minLatticeDist(v: ArrayData, cents: Array[Array[Long]]): Any = {
    val m = cents.length
    if (m == 0) return null
    val d = cents(0).length
    if (v.numElements() != d) return null
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      x(i) = v.getLong(i)
      i += 1
    }
    var bestD = Long.MaxValue
    var c = 0
    while (c < m) {
      val cv = cents(c)
      var dist = 0L
      var j = 0
      while (j < d) {
        val t = x(j) - cv(j)
        dist += t * t
        j += 1
      }
      if (dist < bestD) bestD = dist
      c += 1
    }
    java.lang.Long.valueOf(bestD)
  }
}

/** `graft_nearest_lattice(q)` — nearest centroid id under exact integer
  * L2 over `array<bigint>` lattice vectors; ties to the lowest cid. */
case class NearestLatticeCentroid(
    child: Expression,
    centroids: Seq[(Int, Seq[Long])])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_lattice"

  override def checkInputDataTypes(): TypeCheckResult =
    if (centroids.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires centroids")
    else if (centroids.map(_._2.size).distinct.size != 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires equal-dimension centroids")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.simpleString}")
    }

  @transient private lazy val sorted = centroids.sortBy(_._1)
  @transient private lazy val centsArr: Array[Array[Long]] =
    sorted.map(_._2.toArray).toArray
  @transient private lazy val idsArr: Array[Int] = sorted.map(_._1).toArray

  override protected def nullSafeEval(input: Any): Any =
    LatticeKernels.nearestLattice(
      input.asInstanceOf[ArrayData], centsArr, idsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftLatticeCents", centsArr, "long[][]")
    val idsRef = ctx.addReferenceObj("graftLatticeIds", idsArr, "int[]")
    val boxed = ctx.freshName("nlBoxed")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer $boxed =
        (java.lang.Integer) graft.functions.expressions.LatticeKernels
          .nearestLattice($c, $centsRef, $idsRef);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.intValue();
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_min_lattice_dist(q)` — exact long L2 distance to the NEAREST of
  * the given lattice vectors: the D²(x, C) term of k-means‖ seeding
  * (Bahmani et al. 2012). Same compiled-kernel shape as
  * [[NearestLatticeCentroid]]; the candidate matrix rides as a codegen
  * reference object, so the plan stays O(1) in candidate count. */
case class NearestLatticeDistance(
    child: Expression,
    centroids: Seq[Seq[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_lattice_dist"

  override def checkInputDataTypes(): TypeCheckResult =
    if (centroids.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires centroids")
    else if (centroids.map(_.size).distinct.size != 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires equal-dimension centroids")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.simpleString}")
    }

  @transient private lazy val centsArr: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    LatticeKernels.minLatticeDist(input.asInstanceOf[ArrayData], centsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftLatticeDistCents", centsArr, "long[][]")
    val boxed = ctx.freshName("mldBoxed")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $boxed =
        (java.lang.Long) graft.functions.expressions.LatticeKernels
          .minLatticeDist($c, $centsRef);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.longValue();
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
