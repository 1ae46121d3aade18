package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Sharded Bloom-filter membership probe.
  *
  * One Bloom sketch is the classic known-content gate, but a single
  * sketch sized for a 10⁹-document corpus at a useful fpp is ~1 GB — past
  * the session's runtime-filter caps and an unreasonable single plan
  * constant. Sharding by `floorMod(hash, numShards)` keeps every shard
  * under the caps while the shard UNION covers the full corpus: probe
  * cost stays one `mightContainLong` (the hash picks its shard first),
  * and each shard is independently buildable/mergeable — the layout a
  * 100 TB corpus's content index actually needs.
  *
  * The deserialized filters ride the expression as a codegen reference
  * object (the [[PqKernels]] pattern): plan size is O(1) in sketch bytes
  * for equality/hashing purposes because [[BloomShards]] carries a
  * precomputed SHA-256 content digest — structural expression equality
  * (and so subexpression elimination) costs O(1) per comparison instead
  * of re-hashing up to 64 MB per shard on every optimizer pass.
  */
object BloomKernels {

  /** Shard pick must mirror the build side's `pmod(hash, numShards)`:
    * `floorMod` and Spark's `pmod` agree for a positive divisor. */
  def contains(filters: Array[BloomFilter], h: Long): Boolean = {
    val s = java.lang.Math.floorMod(h, filters.length.toLong).toInt
    filters(s).mightContainLong(h)
  }
}

/** Immutable carrier for deserialized shard filters with O(1)
  * content-based equality (SHA-256 digest of the serialized shards,
  * length-prefixed, computed once at construction). Serializable so both
  * the interpreted expression tree and codegen references ship to
  * executors. Shard `i` of [[BloomShards.fromBytes]] is the filter for
  * `floorMod(hash, n) == i`.
  */
final class BloomShards private (
    val filters: Array[BloomFilter],
    private val digestHi: Long,
    private val digestLo: Long)
    extends Serializable {
  def numShards: Int = filters.length
  override def equals(o: Any): Boolean = o match {
    case b: BloomShards =>
      b.digestHi == digestHi && b.digestLo == digestLo &&
        b.numShards == numShards
    case _ => false
  }
  override def hashCode: Int = java.lang.Long.hashCode(digestHi ^ digestLo)
  override def toString: String =
    f"BloomShards($numShards%d shards, digest=$digestLo%016x)"
}

object BloomShards {

  /** Bytes are the `org.apache.spark.util.sketch.BloomFilter`
    * serialization — the exact format `BloomFilterAggregate` emits and
    * `BloomFilter.readFrom` consumes (version-tagged, so V1/V2 sketches
    * both load). */
  def fromBytes(shards: Seq[Array[Byte]]): BloomShards = {
    require(shards.nonEmpty, "BloomShards: at least one shard required")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val len = java.nio.ByteBuffer.allocate(4)
    shards.foreach { b =>
      len.clear(); len.putInt(b.length)
      md.update(len.array())
      md.update(b)
    }
    val d = java.nio.ByteBuffer.wrap(md.digest())
    val filters = shards.iterator
      .map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))
      .toArray
    new BloomShards(filters, d.getLong, d.getLong)
  }
}

/** `graft_bloom_contains(hash)` — true iff the sharded sketch might
  * contain the 64-bit hash. No false negatives over inserted hashes (the
  * Bloom guarantee), so `!contains` proves novelty; `contains` is only a
  * candidate signal and needs exact confirmation downstream.
  */
case class BloomShardContains(child: Expression, shards: BloomShards)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash child, got ${t.simpleString}")
    }

  override protected def nullSafeEval(h: Any): Any =
    BloomKernels.contains(shards.filters, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomShards", shards.filters,
      "org.apache.spark.util.sketch.BloomFilter[]")
    nullSafeCodeGen(ctx, ev, h => s"""
      ${ev.value} = graft.functions.expressions.BloomKernels.contains($ref, $h);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
