package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items buffer (Misra & Gries 1982; weighted and
  * mergeable per Agarwal et al. 2012, "Mergeable Summaries"): at most `k`
  * counters regardless of input size. Each retained count is a LOWER
  * bound on the true count, short by at most the accumulated decrement
  * mass — bounded by `W/(k+1)` for total weight W — so every item with
  * true weight above `W/(k+1)` is GUARANTEED retained. If a group holds
  * at most k distinct items, no decrement ever fires anywhere (update or
  * merge) and every count is EXACT — the oracle hook, the same
  * no-op-parameter-⇒-exact pattern as IVF's nprobe-all.
  */
final class MgBuffer(val k: Int) {
  private[expressions] val counts =
    new java.util.HashMap[UTF8String, java.lang.Long](16)

  /** Weighted MG update: add, then restore the ≤ k bound by subtracting
    * the minimum count from every counter (the minimum reaches zero, so
    * at least one counter drops). */
  def add(term: UTF8String, w: Long): Unit = {
    if (w <= 0) return
    val cur = counts.get(term)
    if (cur != null) {
      counts.put(term, java.lang.Long.valueOf(cur.longValue() + w))
    } else if (counts.size() < k) {
      counts.put(term, java.lang.Long.valueOf(w))
    } else {
      counts.put(term, java.lang.Long.valueOf(w))
      shrink()
    }
  }

  /** Mergeable-summaries combine: pointwise sum, then if over k counters
    * subtract the (k+1)-th largest count from all and drop ≤ 0. */
  def absorb(other: MgBuffer): MgBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, java.lang.Long.valueOf(
        (if (cur == null) 0L else cur.longValue()) + e.getValue.longValue()))
    }
    if (counts.size() > k) shrink()
    this
  }

  /** Subtract the (k+1)-th largest count from every counter and remove
    * the non-positive ones — leaves ≤ k counters. (For the update path,
    * size is k+1 and the (k+1)-th largest IS the minimum.) */
  private def shrink(): Unit = {
    val vals = new Array[Long](counts.size())
    var i = 0
    val vi = counts.values().iterator()
    while (vi.hasNext) { vals(i) = vi.next().longValue(); i += 1 }
    java.util.Arrays.sort(vals)
    // (k+1)-th largest = index size-(k+1) in ascending order
    val d = vals(vals.length - (k + 1))
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue.longValue() - d
      if (nv <= 0) it.remove()
      else e.setValue(java.lang.Long.valueOf(nv))
    }
  }
}

/** `graft_heavy_hitters(term, weight, k)` — per-group Misra–Gries
  * frequent items as a partial-combine-friendly aggregate. Returns
  * `array<struct<term: string, count: bigint>>` sorted (count desc, term
  * asc), at most k entries. Counts are lower bounds within `W/(k+1)`;
  * EXACT whenever the group's distinct-term count is ≤ k (no decrement
  * can fire in any partial or merge — the DuckDB-oracle regime). The
  * 100 TB shape: each map task combines its partition into a ≤ k-counter
  * buffer per group before the exchange — the full token stream never
  * shuffles, unlike an exact groupBy(term) count over a web-scale
  * vocabulary. */
case class MisraGries(
    term: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  override def prettyName: String = "graft_heavy_hitters"
  override def children: Seq[Expression] = Seq(term, weight)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (term.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string term, got ${term.dataType.simpleString}")
    else if (!Seq[DataType](IntegerType, LongType).contains(weight.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an int/bigint weight, got ${weight.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val t = term.eval(input)
    if (t != null) {
      val w = weight.eval(input)
      if (w != null) {
        val wl = w match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long    => l.longValue()
        }
        // copy: the UTF8String may point into a reused row buffer
        buffer.add(t.asInstanceOf[UTF8String].clone(), wl)
      }
    }
    buffer
  }

  override def merge(buffer: MgBuffer, input: MgBuffer): MgBuffer =
    buffer.absorb(input)

  override def eval(buffer: MgBuffer): Any = {
    val entries = new Array[(UTF8String, Long)](buffer.counts.size())
    var i = 0
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    java.util.Arrays.sort(entries,
      new java.util.Comparator[(UTF8String, Long)] {
        override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2)
          if (c != 0) c else a._1.compareTo(b._1)
        }
      })
    val out = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      out(i) = new GenericInternalRow(Array[Any](
        entries(i)._1, java.lang.Long.valueOf(entries(i)._2)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    var bytes = 4
    val it = buffer.counts.keySet().iterator()
    while (it.hasNext) bytes += 4 + it.next().numBytes() + 8
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.counts.size())
    val es = buffer.counts.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt()
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong()
      buf.counts.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(c))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(term = newChildren(0), weight = newChildren(1))
}
