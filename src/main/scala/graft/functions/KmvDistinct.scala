package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Bounded set of the k minimum hashes (deduped, ascending). */
final class KmvBuffer(val k: Int) extends Serializable {
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

  private def hash60(s: String): Long = KmvDistinct.hash60(s)

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

  override def eval(buf: KmvBuffer): Any = KmvDistinct.estimate(buf, k)

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

object KmvDistinct {
  /** The sketch kernel, shared by the TypedImperativeAggregate and the
    * V2 catalog aggregate ([[KmvDistinctV2]]) — one hash family, one
    * estimator, so the two surfaces are bit-identical and b33's DuckDB
    * oracle serves both.
    */
  def hash60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars == first 60 bits: 8 big-endian bytes >>> 4
    ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }
  def estimate(buf: KmvBuffer, k: Int): Long =
    if (buf.hashes.size < k) buf.hashes.size.toLong
    else math.floor((k - 1).toDouble * 1152921504606846976.0 /
      buf.hashes.last().toDouble).toLong
}

/** The SAME KMV sketch as a DSv2 catalog AGGREGATE function
  * (`AggregateFunction[KmvBuffer, Long]`), b76's aggregate sibling:
  * Spark partial-aggregates it exactly like the native
  * TypedImperativeAggregate (update on executors, serialized KmvBuffer
  * states merged across partitions, one result per group), but the
  * definition is resolved THROUGH THE CATALOG — the sketch algorithm
  * ships once per catalog, not once per session registry.
  */
object KmvDistinctV2
    extends org.apache.spark.sql.connector.catalog.functions
      .AggregateFunction[KmvBuffer, java.lang.Long] {
  private val k = 64
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "kmv_distinct"
  override def canonicalName(): String = "graft.functions.kmv_distinct"
  override def isResultNullable: Boolean = false
  override def newAggregationState(): KmvBuffer = new KmvBuffer(k)
  override def update(state: KmvBuffer, input: InternalRow): KmvBuffer = {
    if (!input.isNullAt(0))
      state.offer(KmvDistinct.hash60(java.lang.Long.toString(input.getLong(0))))
    state
  }
  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    val it = b.hashes.iterator()
    while (it.hasNext) a.offer(it.next())
    a
  }
  override def produceResult(state: KmvBuffer): java.lang.Long =
    KmvDistinct.estimate(state, k)
}

object KmvDistinctV2Unbound
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "kmv_distinct"
  override def description(): String = "kmv_distinct(bigint) -> bigint"
  override def bind(inputType: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    val ok = inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType
    if (!ok) throw new UnsupportedOperationException(
      s"kmv_distinct expects one BIGINT argument, got $inputType")
    KmvDistinctV2
  }
}
