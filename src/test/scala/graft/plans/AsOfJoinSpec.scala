package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The custom-operator stack: physical plan shape, cross-check against
  * the composition twin, and edge semantics on tiny data.
  */
class AsOfJoinSpec extends SparkSpec {

  test("b32 plans AsOfJoinExec with exchanges+sorts inserted by EnsureRequirements") {
    val df = SparkEntry.queries("b32_join_asof_native")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("AsOfJoin "), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Sort ["), p)
  }

  test("custom exec result == composition twin result (b32 == b31)") {
    val native = SparkEntry.queries("b32_join_asof_native")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val composed = SparkEntry.queries("b31_join_asof")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(native == composed)
  }

  test("as-of semantics on tiny data: latest at-or-before, null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 20L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 90L), (1L, 150L, 91L), (1L, 300L, 92L))
      .toDF("k2", "t2", "rid")
    val out = AsOfJoin.join(left, right, "k", "t", "k2", "t2")
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // lid 10 (t=100): rid 90 at t2=100 (equal counts, at-or-before)
    // lid 11 (t=200): rid 91 at t2=150 (latest <= 200; 300 excluded)
    // lid 20 (k=2): no right rows for key -> null
    assert(out == Map(10L -> 90L, 11L -> 91L, 20L -> -1L))
  }
}
