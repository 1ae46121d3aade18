package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.expressions.{CosineSimilarity, DotProduct, DuplicateNgramFraction, MinHashSignature, RollingFingerprint, SimHash64, SlotAgreement, TokenCounts, WordNgrams}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or call
  * [[GraftExtensions.register]] on a live session.
  *
  * SQL surface:
  *  - `graft_minhash_signature(text, k, numHashes)` → array<bigint>
  *  - `graft_simhash64(text)` → bigint
  *  - `graft_cosine(vec, vec)` → double
  *  - `graft_dot(vec, vec)` → double
  *  - `graft_slot_agreement(array<bigint>, array<bigint>)` → bigint
  *  - `graft_token_counts(text)` → map<string,bigint>
  *  - `graft_fingerprint(text[, base, mod])` → bigint (re-basable hash family)
  *  - `graft_word_ngrams(text, n)` → array<string>
  *  - `graft_dup_ngram_fraction(text, n)` → double
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
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
      require(exprs.length == 3 || exprs.length == 4,
        "graft_minhash_signature(text, k, numHashes[, sampleShift]) takes 3 or 4 arguments")
      MinHashSignature(exprs.head,
        intLit(exprs(1), "k"), intLit(exprs(2), "numHashes"),
        if (exprs.length == 4) intLit(exprs(3), "sampleShift") else 0)
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

  private[graft] val cosineFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_cosine(a, b) takes 2 arguments")
      CosineSimilarity(exprs.head, exprs(1))
    }
  )

  private[graft] val dotFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_dot(a, b) takes 2 arguments")
      DotProduct(exprs.head, exprs(1))
    }
  )

  private[graft] val slotAgreementFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_slot_agreement"),
    new ExpressionInfo(classOf[SlotAgreement].getName, "graft_slot_agreement"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        "graft_slot_agreement(a, b) takes 2 arguments")
      SlotAgreement(exprs.head, exprs(1))
    }
  )

  private[graft] val tokenCountsFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_counts"),
    new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_token_counts(text) takes 1 argument")
      TokenCounts(exprs.head)
    }
  )

  private[graft] val fingerprintFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fingerprint"),
    new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1 || exprs.length == 3,
        "graft_fingerprint(text[, base, mod]) takes 1 or 3 arguments")
      if (exprs.length == 1) RollingFingerprint(exprs.head)
      else RollingFingerprint(exprs.head,
        intLit(exprs(1), "base").toLong, intLit(exprs(2), "mod").toLong)
    }
  )

  private[graft] val wordNgramsFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_word_ngrams(text, n) takes 2 arguments")
      WordNgrams(exprs.head, intLit(exprs(1), "n"))
    }
  )

  private[graft] val dupNgramFractionFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dup_ngram_fraction"),
    new ExpressionInfo(classOf[DuplicateNgramFraction].getName,
      "graft_dup_ngram_fraction"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        "graft_dup_ngram_fraction(text, n) takes 2 arguments")
      DuplicateNgramFraction(exprs.head, intLit(exprs(1), "n"))
    }
  )

  private[graft] val all = Seq(minhashSignatureFn, simhash64Fn, cosineFn,
    dotFn, slotAgreementFn, tokenCountsFn, fingerprintFn, wordNgramsFn,
    dupNgramFractionFn)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
