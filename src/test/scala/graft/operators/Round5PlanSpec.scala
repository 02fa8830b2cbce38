package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Round-5 physical-plan assertions (EXECUTED plans, not optimized
  * logical): the decorrelation shapes b48/b49 claim.
  */
class Round5PlanSpec extends SparkSpec {

  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.count() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("b48: EXISTS/NOT EXISTS decorrelate to one semi + one anti join") {
    val p = executed("b48_subquery_exists")
    assert(p.contains("LeftSemi"), p.take(800))
    assert(p.contains("LeftAnti"), p.take(800))
    // the subquery predicates are pushed into the lineitem scans
    assert(p.contains("EqualTo(l_returnflag,R)"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("b49: lateral aggregate decorrelates — aggregation BELOW the join, no nested loop") {
    val p = executed("b49_join_lateral")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the per-nation aggregate runs as a partial-agg'd customer pass,
    // not |nation| re-scans: partial_count below an exchange
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("b50: BFS levels are complete and monotone") {
    val rows = SparkEntry.queries("b50_graph_bfs")(spark, sf0001).collect()
    val byDist = rows.map(r =>
      r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    // depth 0 is exactly the source node
    assert(byDist(0L) == 1L)
    // the bipartite graph alternates sides: odd = parts (ids >= 0),
    // even = suppliers (ids < 0 after the +1 shift)
    rows.foreach { r =>
      val d = r.getAs[Long]("dist")
      if (d > 0 && d % 2 == 1) assert(r.getAs[Long]("min_node") >= 0)
      if (d > 0 && d % 2 == 0) assert(r.getAs[Long]("max_node") < 0)
    }
  }
}
