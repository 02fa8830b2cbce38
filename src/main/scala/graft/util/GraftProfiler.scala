package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** `--mrs-profile` parity [mrs: mrs/main.py]: the reference flag writes
  * a per-task profile dump; Spark already collects per-task metrics in
  * the UI/event log, so the graft knob surfaces the per-query roll-up.
  * With `graft.profile=true`, every completed query action prints one
  * `[profile]` stderr line: action name, wall seconds, and the executed
  * physical plan's node census (e.g. `HashAggregate×2,Exchange×1,...` —
  * enough to spot an unexpected shuffle or a missing broadcast without
  * opening the UI). Zero overhead when the knob is off.
  */
object GraftProfiler {
  /** Label for [profile] attribution, set by the harness around each
    * timed query. A plain volatile rather than the job description:
    * QueryExecutionListener fires on the ASYNC listener bus, so the
    * submitting thread's local properties are not visible there. The
    * bus drains within the same query in practice; a late event can at
    * worst carry the next query's label (attribution aid, not a
    * measurement).
    */
  @volatile var label: String = "-"

  def install(s: SparkSession): Unit =
    if (s.conf.getOption("graft.profile").contains("true")) {
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(
            funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
          // Unwrap AdaptiveSparkPlanExec: its final physical plan is a
          // FIELD, not a child, so a plain collect would census the
          // wrapper alone ("AdaptiveSparkPlan x1") and hide every
          // Exchange/join the query actually ran.
          import org.apache.spark.sql.execution.SparkPlan
          import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
          def nodes(p: SparkPlan): Seq[String] = p.collect {
            case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
            case q: QueryStageExec => q.nodeName +: nodes(q.plan)
            case n => Seq(n.nodeName)
          }.flatten
          val census = nodes(qe.executedPlan)
            .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
            .toSeq.sorted.mkString(", ")
          System.err.println(
            f"[profile] $label | $funcName ${durationNs / 1e9}%.3f s | $census")
        }
        override def onFailure(
            funcName: String, qe: QueryExecution, error: Exception): Unit =
          System.err.println(s"[profile] $funcName FAILED: ${error.getMessage}")
      })
    }
}
