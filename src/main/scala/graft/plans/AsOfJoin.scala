package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator stack (SURVEY §7.3 / guide §"Custom
  * operator"): an AS-OF join Spark lacks as a first-class operator —
  * each left row matched to the right row with the greatest time
  * at-or-before the left's time, per key.
  *
  * Logical node → planner [[AsOfJoinStrategy]] → physical
  * [[AsOfJoinExec]], injected via `graft.functions.GraftExtensions`
  * (or per-session with [[AsOfJoin.strategy]]).
  *
  * Key and time may be ANY orderable type (string keys, timestamp or
  * decimal times, …): the merge compares through the type's interpreted
  * ordering, with a primitive fast path when both sides are physically
  * long (ids, epoch µs, TimestampType). Left/right key and time types
  * must match pairwise.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression)
  extends BinaryNode {
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  // right side is null-padded when unmatched
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join.
  *
  * Scale contract: EnsureRequirements gives both sides the same hash
  * partitioning on the key (one shuffle each, same as an equi join) and
  * a per-partition (key, time) sort; the merge itself is a single
  * streaming pass holding ONE buffered right row — O(1) memory per
  * partition regardless of input size, no candidate-pair blowup.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Types whose InternalRow representation is a primitive long, so the
    * merge can compare with `getLong` and never box.
    */
  private def physicallyLong(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val lt = leftTime
    val rk = rightKey
    val rt = rightTime
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val fastPath = physicallyLong(keyType) && physicallyLong(timeType)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lkProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rkProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      var lastRight: InternalRow = null
      if (fastPath) {
        var lastRightKey = 0L
        lIt.map { l =>
          val lkt = lkProj(l)
          val lKey = lkt.getLong(0)
          val lTime = lkt.getLong(1)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rkt = rkProj(rBuf.head)
            val rKey = rkt.getLong(0)
            val rTime = rkt.getLong(1)
            if (rKey < lKey || (rKey == lKey && rTime <= lTime)) {
              // rows are reused by the upstream iterator: copy on retain
              lastRight = rBuf.next().copy()
              lastRightKey = rKey
            } else {
              advance = false
            }
          }
          if (lastRight != null && lastRightKey == lKey) joined(l, lastRight)
          else joined(l, nullRight)
        }
      } else {
        val keyOrd =
          org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(keyType)
        val timeOrd =
          org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(timeType)
        var lastRightKey: Any = null
        lIt.map { l =>
          val lkt = lkProj(l)
          val lKey = lkt.get(0, keyType)
          val lTime = lkt.get(1, timeType)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rkt = rkProj(rBuf.head)
            val rKey = rkt.get(0, keyType)
            val rTime = rkt.get(1, timeType)
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lTime) <= 0)) {
              lastRight = rBuf.next().copy()
              // the projection buffer is reused: deep-copy the retained
              // key (UTF8String/Decimal would otherwise be clobbered)
              lastRightKey = InternalRow.copyValue(rKey)
            } else {
              advance = false
            }
          }
          if (lastRight != null && keyOrd.compare(lastRightKey, lKey) == 0)
            joined(l, lastRight)
          else joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (the SURVEY §7.3 `Rule[LogicalPlan]` extension
  * point doing real work): push deterministic left-only filter
  * conjuncts below [[AsOfJoinPlan]]. Safe because the as-of join emits
  * exactly one output row per LEFT row — a predicate over left
  * attributes commutes with the join. Once below the join, Catalyst's
  * stock pushdown carries the predicate all the way into the left
  * scan's `PushedFilters` (asserted in AsOfJoinSpec) — at 100 TB that
  * is the difference between scanning the filtered slice and scanning
  * everything into the shuffle.
  */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }
}

/** Planner strategy mapping the logical node to the physical one. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `AsOfJoin.join(left, right, "k", "t", "k2", "t2")`.
  * Registers the strategy on the live session via the public
  * `spark.experimental.extraStrategies` hook (idempotent); the
  * `GraftExtensions` injector covers the `spark.sql.extensions` path.
  */
object AsOfJoin {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(AsOfJoinFilterPushdown))
      spark.experimental.extraOptimizations = opts :+ AsOfJoinFilterPushdown
  }

  def join(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession
    register(spark)
    import org.apache.spark.sql.functions.col
    // SQL join semantics: a null key or time never matches. Filtering
    // up front (rather than special-casing the merge) keeps the
    // comparators null-free and pushes into both scans. The left side
    // keeps its null rows OUT of the output like an inner-equi join
    // would on the key — as-of is "equi on key, argmax on time".
    val l2 = left.where(col(leftKey).isNotNull && col(leftTime).isNotNull)
    val r2 = right.where(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val lPlan = l2.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(lPlan, leftTime),
        attr(rPlan, rightKey), attr(rPlan, rightTime)))
  }
}
