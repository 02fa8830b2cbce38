package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Bounded set of the k minimum hashes (deduped, ascending). */
final class KmvBuffer(val k: Int) {
  val hashes = new java.util.TreeSet[java.lang.Long]()
  def offer(h: Long): Unit = {
    if (hashes.size < k) { hashes.add(h); () }
    else if (h < hashes.last()) {
      if (hashes.add(h)) { hashes.remove(hashes.last()); () }
    }
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the raw-buffer aggregate extension
  * point (SURVEY §7.3; the tier below `Aggregator`, used by Spark's own
  * HLL/percentile sketches). Constant k·8 bytes of state per group at
  * any scale; merge is a bounded set union, so it partial-aggregates.
  *
  * Deliberately DETERMINISTIC and portable, unlike HLL: the hash is the
  * same md5-prefix family as everywhere else in graft
  * (`substr(md5(v::VARCHAR),1,15)` as a 60-bit integer), and the
  * estimate is `floor((k-1) · 2^60 / h_k)` — so DuckDB reproduces the
  * sketch EXACTLY and the driver hash-compare applies to an
  * approximate aggregate (b33).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  private def hash60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars == first 60 bits: 8 big-endian bytes >>> 4
    val top = ByteBuffer.wrap(d, 0, 8).getLong
    top >>> 4
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(hash60(v.toString))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.hashes.iterator()
    while (it.hasNext) buf.offer(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    if (buf.hashes.size < k) buf.hashes.size.toLong
    else math.floor((k - 1).toDouble * 1152921504606846976.0 /
      buf.hashes.last().toDouble).toLong

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.hashes.size * 8)
    bb.putInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    (1 to n).foreach(_ => buf.hashes.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}
