package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.expressions.{MinHashSignature, SimHash64}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or call
  * [[GraftExtensions.register]] on a live session.
  *
  * SQL: `graft_minhash_signature(text, k, numHashes)` → array<bigint>.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.minhashSignatureFn)
    ext.injectFunction(GraftExtensions.simhash64Fn)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, argName: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$argName must be an integer literal, got: $other")
  }

  private[graft] val minhashSignatureFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_signature"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3,
        "graft_minhash_signature(text, k, numHashes) takes 3 arguments")
      MinHashSignature(exprs.head,
        intLit(exprs(1), "k"), intLit(exprs(2), "numHashes"))
    }
  )

  private[graft] val simhash64Fn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_simhash64(text) takes 1 argument")
      SimHash64(exprs.head)
    }
  )

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    Seq(minhashSignatureFn, simhash64Fn).foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
