package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-group as a typed `Aggregator` — SURVEY §7.3's
  * flagged scale upgrade for B15. Spark ≥ 3.5 already bounds the
  * window form's SHUFFLE (`InferWindowGroupLimit` plants a Partial
  * `WindowGroupLimit` below the exchange, so only ~k rows per group
  * per map partition move) — but that plan still pays a FULL local
  * sort of every scanned partition on the map side and a second sort
  * on the reduce side, because WindowGroupLimit is a rank filter over
  * sorted input, not an aggregate. This aggregator removes the sorts
  * entirely: ObjectHashAggregate streams O(n·k) buffer updates
  * map-side and merges bounded k-row buffers reduce-side — no sort
  * operator anywhere below the final presentation ORDER BY
  * (plan-asserted). One runtime trap guards the claim: ObjectHashAgg
  * falls back to sort-based aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys per partition (default 128 — i.e. nearly always), re-creating
  * the sort invisibly to the plan; graft's session defaults raise it
  * to 1M (see Bench.scala). At 100 TB the map-side n·log n over every
  * scan partition is the term that matters.
  *
  * Ordering is (sortkey DESC, id ASC) — the same total order b15
  * declares, so the two plans are result-identical and b15's oracle
  * applies verbatim. The buffer is kept sorted; insert is a linear
  * scan (k is small by contract — this is a top-k, not a sort).
  */
final case class TopKByScore(k: Int)
    extends Aggregator[(Long, Double),
      scala.collection.mutable.ArrayBuffer[(Double, Long)], Seq[(Long, Double)]] {

  require(k > 0, s"TopKByScore needs k > 0 (got $k)")

  private type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** In-place bounded insert. ObjectHashAggregate holds the buffer as a
    * live object between input rows (serialization happens only at the
    * partial→exchange boundary), so mutating beats rebuilding an
    * immutable Seq per row — the hot path is one linear scan and at
    * most one O(k) shift, zero allocation on the common reject path.
    */
  private def insert(buf: Buf, e: (Double, Long)): Buf = {
    if (buf.length == k && !better(e, buf(k - 1))) buf
    else {
      var i = 0
      while (i < buf.length && !better(e, buf(i))) i += 1
      buf.insert(i, e)
      if (buf.length > k) buf.remove(k)
      buf
    }
  }

  override def zero: Buf = new Buf(k)

  override def reduce(buf: Buf, in: (Long, Double)): Buf =
    insert(buf, (in._2, in._1))

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach(e => insert(a, e))
    a
  }

  override def finish(buf: Buf): Seq[(Long, Double)] =
    buf.toSeq.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}
