package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distributed BPE merge TRAINING — the half of the tokenizer lifecycle
  * [[Bpe]] was missing: `fromMerges` ingests an externally-trained merge
  * table, `trainMerges` derives one from the corpus being curated, the
  * way real pipelines train the tokenizer on the data they bill token
  * budgets with (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — the reference engine has no
  * tokenizer; this is an LLM-pipeline extension).
  *
  * Scale shape (the classic trainer, distributed):
  *
  *   1. ONE corpus scan folds documents into a distinct-word histogram
  *      `(word, cnt)` — map-side combined, so the only thing that ever
  *      shuffles is the Zipf-bounded distinct vocabulary, never text.
  *   2. Training state lives on the CLUSTER as `(word, cnt, syms)` where
  *      `syms` is the word's current symbol sequence (array<string>,
  *      initially one symbol per character). Merges never cross word
  *      boundaries (Sennrich), so the histogram is a lossless, massively
  *      smaller proxy for the corpus: pair counts weight by `cnt`.
  *   3. Per round: adjacent-pair counts (partial-agg'd — the shuffle
  *      carries distinct PAIRS only), a 1-row driver argmax pull
  *      (count DESC, then lexicographic — deterministic and
  *      SQL-replayable), then an incremental re-encode: one narrow map
  *      applying just the new merge via the [[BpeMergeAdjacent]] kernel.
  *      State is persisted each round so round r+1 does not replay
  *      merges 0..r from the raw histogram.
  *
  * Determinism: integer counts, total tie-break order, and merge-all
  * left-to-right application make the trained table a pure function of
  * the histogram — bit-identical across partitionings, and replayable
  * round-for-round by a SQL oracle (unrolled CTEs: pair counts from the
  * delimiter-wrapped symbol string, argmax via ORDER BY/LIMIT 1, apply
  * via `replace`). Because a merge's operands always predate it, a
  * TRAINED table is chain-structured in the sense that matters
  * ([[BpeEncoder.chainStructured]] over creation ranks): rank-ordered
  * exhaustive application — and hence the oracle's replay AND the
  * trained state itself — equals the dynamic greedy encode loop.
  *
  * Output collisions: two selected pairs could concatenate to the same
  * surface string (e.g. `(a,bc)` and `(ab,c)`); [[BpeEncoder]] forbids
  * duplicate outputs (ids would be ambiguous), so candidates whose
  * output equals an already-created merge output are EXCLUDED from the
  * argmax — replayed in SQL as a `NOT IN (prior outputs)` filter. */
object BpeTrain {

  /** One trained merge: creation rank, operands, and the weighted
    * adjacent-pair count at selection time. */
  final case class TrainedMerge(rank: Int, left: String, right: String,
      pairCount: Long)

  /** Trained merges plus the final cluster-resident training state
    * `(word, cnt, syms)` — callers aggregate corpus token totals from it
    * and MUST `unpersist()` it when done. */
  final case class TrainResult(merges: IndexedSeq[TrainedMerge],
      finalState: DataFrame) {
    def mergePairs: IndexedSeq[(String, String)] =
      merges.map(m => (m.left, m.right))
    /** Encoder over the trained table (greedy loop == replay, see
      * object doc). */
    def encoder(pretoken: Bpe.Pretoken = Bpe.PretokenLetters): BpeEncoder =
      new BpeEncoder(mergePairs, pretoken)
  }

  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def expr0(c: Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** Merge-all non-overlapping left-to-right occurrences of `(a, b)` in
    * a symbol array — one training round's incremental re-encode. */
  def mergeAdjacent(syms: Column, a: String, b: String): Column =
    bridge(BpeMergeAdjacent(expr0(syms), a, b))

  /** Adjacent-pair struct array of a symbol array (overlapping pairs all
    * counted, the classic trainer's statistic): `[(s1,s2),(s2,s3),…]`;
    * empty for single-symbol words. */
  private def adjacentPairs(syms: Column): Column = {
    val n = size(syms)
    when(n >= 2,
      transform(sequence(lit(1), n - 1), i =>
        struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  /** Train `numMerges` BPE merges from a word histogram `(wordCol,
    * cntCol)`. Stops early (fewer merges) when no pair remains. The
    * returned [[TrainResult.finalState]] is persisted — unpersist after
    * aggregating from it. */
  def trainMerges(words: DataFrame, wordCol: String, cntCol: String,
      numMerges: Int): TrainResult = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = words.sparkSession
    val chars = transform(sequence(lit(1), length(col(wordCol))),
      i => col(wordCol).substr(i, lit(1)))
    var state = words.select(col(wordCol).as("wd"),
      col(cntCol).cast("long").as("cnt"), chars.as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the parent state stays persisted until the CHILD has been
    // materialized by the next round's pair-count job (or the caller's
    // first action, for the last round) — round r+1's argmax scan IS the
    // materialization, so no dedicated count() job runs per round; a
    // round therefore costs exactly ONE job
    var parent: DataFrame = null
    val out = scala.collection.mutable.ArrayBuffer.empty[TrainedMerge]
    var exhausted = false
    var r = 0
    while (r < numMerges && !exhausted) {
      val taken = out.map(m => m.left + m.right).toSet
      // distinct pairs only ride this shuffle (partial agg folds each
      // partition's occurrences first); argmax is a 1-row driver pull —
      // this job also materializes `state`'s persisted blocks, making
      // the previous round's parent safe to drop
      val top = state
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("n"))
        .filter(!concat(col("a"), col("b"))
          .isin(taken.toSeq.map(x => x: Any): _*))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (parent != null) { parent.unpersist(blocking = false); parent = null }
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        out += TrainedMerge(r, a, b, top(0).getLong(2))
        val next = state
          .withColumn("syms", mergeAdjacent(col("syms"), a, b))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        parent = state // dropped after `next` materializes (next round /
        // the caller's first action over finalState)
        state = next
        r += 1
      }
    }
    if (parent != null) {
      // one materialization for the LAST round's state (every earlier
      // round was materialized by its successor's argmax job), then the
      // final parent can go
      state.count()
      parent.unpersist(blocking = false)
    }
    TrainResult(out.toIndexedSeq, state)
  }
}

/** Kernel for one training round's re-encode: collapse every
  * non-overlapping left-to-right occurrence of `(a, b)` in an
  * array<string> of symbols into the merged symbol `a+b` — identical
  * semantics to the inner merge step of [[BpeEncoder]]'s greedy loop.
  * Codegen'd call on a reference object; O(n) per row, no allocation
  * beyond the output array. */
case class BpeMergeAdjacent(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_merge_adjacent"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val uab = UTF8String.fromString(a + b)

  def merge(in: ArrayData): ArrayData = {
    val n = in.numElements()
    if (n < 2) return in
    val buf = new Array[Any](n)
    var src = 0
    var dst = 0
    while (src < n) {
      val cur = in.getUTF8String(src)
      if (src < n - 1 && cur.equals(ua) && in.getUTF8String(src + 1).equals(ub)) {
        buf(dst) = uab
        src += 2
      } else {
        buf(dst) = cur
        src += 1
      }
      dst += 1
    }
    if (dst == n) in
    else {
      val out = new Array[Any](dst)
      System.arraycopy(buf, 0, out, 0, dst)
      new GenericArrayData(out)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerge", this,
      classOf[BpeMergeAdjacent].getName)
    defineCodeGen(ctx, ev, c => s"$ref.merge($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
