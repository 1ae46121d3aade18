package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: a binary heap whose root is the WORST retained
  * entry, so a streaming insert is O(log k) and the buffer never exceeds
  * `limit` entries regardless of input size. "Better" means higher score
  * (IEEE-754 total order via `java.lang.Double.compare`, -0.0 normalized
  * to 0.0 as Spark's sort does, null score worst — desc-nulls-last), ties
  * broken by ascending id — exactly the
  * `row_number() OVER (ORDER BY score DESC, id ASC)` ordering the window
  * formulation used, so replacing the window with this aggregate is
  * result-identical while shuffling only `partitions × groups × k`
  * pre-combined entries instead of the full scored cross product, with no
  * global Sort/Window ever materializing.
  *
  * Ids are held in a primitive `Array[Long]` (string ids in a parallel
  * object array) — no boxing on the hot insert path.
  */
final class TopKHeap(val limit: Int) {
  private[expressions] var size = 0
  private[expressions] var scores = new Array[Double](math.max(1, math.min(limit, 16)))
  private[expressions] var nullAt = new Array[Boolean](scores.length)
  private[expressions] var ids = new Array[Long](scores.length)
  // only allocated for string ids
  private[expressions] var strIds: Array[UTF8String] = null

  @inline private def ensureStr(): Unit =
    if (strIds == null) strIds = new Array[UTF8String](scores.length)

  /** true if entry (sA,nA,idA) is strictly WORSE than (sB,nB,idB) under
    * (score desc nulls-last, id asc). */
  @inline private def worse(
      sA: Double, nA: Boolean, iA: Long, uA: UTF8String,
      sB: Double, nB: Boolean, iB: Long, uB: UTF8String): Boolean = {
    if (nA != nB) nA // null score is worse
    else {
      // `+ 0.0` normalizes -0.0 to 0.0 for the comparison (as Spark's
      // NormalizeFloatingNumbers does for sort keys) while the stored —
      // and emitted — score stays the raw value, like the window did
      val c = if (nA) 0 else java.lang.Double.compare(sA + 0.0, sB + 0.0)
      if (c != 0) c < 0
      else if (uA != null || uB != null) uA.compareTo(uB) > 0 // larger id = worse
      else iA > iB
    }
  }

  @inline private def worseIdx(a: Int, b: Int): Boolean =
    worse(scores(a), nullAt(a), ids(a),
      if (strIds == null) null else strIds(a),
      scores(b), nullAt(b), ids(b),
      if (strIds == null) null else strIds(b))

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val n = nullAt(a); nullAt(a) = nullAt(b); nullAt(b) = n
    val i = ids(a); ids(a) = ids(b); ids(b) = i
    if (strIds != null) {
      val u = strIds(a); strIds(a) = strIds(b); strIds(b) = u
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worseIdx(i, (i - 1) / 2)) {
      swap(i, (i - 1) / 2)
      i = (i - 1) / 2
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && worseIdx(l, m)) m = l
      if (r < size && worseIdx(r, m)) m = r
      if (m == i) done = true
      else { swap(i, m); i = m }
    }
  }

  private def grow(): Unit = {
    val cap = math.min(limit.toLong, scores.length.toLong * 2).toInt
    scores = java.util.Arrays.copyOf(scores, cap)
    nullAt = java.util.Arrays.copyOf(nullAt, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
    if (strIds != null) strIds = java.util.Arrays.copyOf(strIds, cap)
  }

  /** Offer an entry; keeps it only if the heap has room or it beats the
    * current worst. `uid` non-null for string ids (caller has copied it). */
  def offer(score: Double, scoreNull: Boolean, id: Long, uid: UTF8String): Unit = {
    val s = score
    if (uid != null) ensureStr()
    if (size < limit) {
      if (size == scores.length) grow()
      scores(size) = s
      nullAt(size) = scoreNull
      ids(size) = id
      if (strIds != null) strIds(size) = uid
      size += 1
      siftUp(size - 1)
    } else if (size > 0 &&
        worse(scores(0), nullAt(0), ids(0),
          if (strIds == null) null else strIds(0), s, scoreNull, id, uid)) {
      scores(0) = s
      nullAt(0) = scoreNull
      ids(0) = id
      if (strIds != null) strIds(0) = uid
      siftDown(0)
    }
  }

  def absorb(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      offer(other.scores(i), other.nullAt(i), other.ids(i),
        if (other.strIds == null) null else other.strIds(i))
      i += 1
    }
    this
  }

  /** Entry indices sorted best-first. */
  def sortedIndices(): Array[Integer] = {
    val idx = Array.tabulate[Integer](size)(i => i)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int =
        if (worseIdx(a, b)) 1 else if (worseIdx(b, a)) -1 else 0
    })
    idx
  }
}

/** `graft_topk(score, id, k)` — bounded per-group top-k as a
  * partial-combine-friendly aggregate. Returns
  * `array<struct<score: double, id: <idType>>>` sorted by
  * (score desc nulls-last, id asc), at most k entries — the replacement
  * for a `row_number() OVER (PARTITION BY group ORDER BY score DESC,
  * id ASC) <= k` window: each map task combines its partition down to k
  * entries per group before the exchange, and no task ever sorts more
  * than its own bounded buffer. Ids may be int/long/string, non-null
  * (null-id rows are ignored; the operators feed key columns).
  *
  * Re-expresses the top-k semantics of the reference's ORDER BY/LIMIT
  * ranking (db2pq query layer) in the shape that survives a
  * billion-row corpus: the unbounded sort is gone from the plan.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false

  private def isStringId: Boolean = id.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double score, got ${score.dataType.simpleString}")
    else if (!Seq[DataType](IntegerType, LongType, StringType).contains(id.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an int/bigint/string id, got ${id.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("id", id.dataType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val idVal = id.eval(input)
    if (idVal != null) {
      val s = score.eval(input)
      if (isStringId) {
        // copy: the UTF8String may point into a reused row buffer
        buffer.offer(
          if (s == null) 0.0 else s.asInstanceOf[Double], s == null,
          0L, idVal.asInstanceOf[UTF8String].clone())
      } else {
        val longId = idVal match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long    => l.longValue()
        }
        buffer.offer(
          if (s == null) 0.0 else s.asInstanceOf[Double], s == null, longId, null)
      }
    }
    buffer
  }

  override def merge(buffer: TopKHeap, input: TopKHeap): TopKHeap =
    buffer.absorb(input)

  override def eval(buffer: TopKHeap): Any = {
    val idx = buffer.sortedIndices()
    val out = new Array[Any](idx.length)
    val intId = id.dataType == IntegerType
    var i = 0
    while (i < idx.length) {
      val j = idx(i).intValue()
      val scoreVal: Any =
        if (buffer.nullAt(j)) null else java.lang.Double.valueOf(buffer.scores(j))
      val idVal: Any =
        if (buffer.strIds != null) buffer.strIds(j)
        else if (intId) java.lang.Integer.valueOf(buffer.ids(j).toInt)
        else java.lang.Long.valueOf(buffer.ids(j))
      out(i) = new GenericInternalRow(Array[Any](scoreVal, idVal))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    // per entry: 8 (score) + 1 (null flag) + id payload
    var bytes = 4 + 4 + buffer.size * 9
    if (buffer.strIds != null) {
      var i = 0
      while (i < buffer.size) {
        bytes += 4 + buffer.strIds(i).numBytes()
        i += 1
      }
    } else {
      bytes += buffer.size * 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    bb.putInt(if (buffer.strIds != null) 1 else 0)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.put(if (buffer.nullAt(i)) 1.toByte else 0.toByte)
      if (buffer.strIds != null) {
        val b = buffer.strIds(i).getBytes
        bb.putInt(b.length)
        bb.put(b)
      } else {
        bb.putLong(buffer.ids(i))
      }
      i += 1
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt()
    val isStr = bb.getInt() == 1
    val heap = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val isNull = bb.get() == 1.toByte
      if (isStr) {
        val len = bb.getInt()
        val b = new Array[Byte](len)
        bb.get(b)
        heap.offer(s, isNull, 0L, UTF8String.fromBytes(b))
      } else {
        heap.offer(s, isNull, bb.getLong(), null)
      }
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
