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
  def install(s: SparkSession): Unit =
    if (s.conf.getOption("graft.profile").contains("true")) {
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(
            funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
          val census = qe.executedPlan.collect { case p => p.nodeName }
            .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
            .toSeq.sorted.mkString(", ")
          System.err.println(
            f"[profile] $funcName ${durationNs / 1e9}%.3f s | $census")
        }
        override def onFailure(
            funcName: String, qe: QueryExecution, error: Exception): Unit =
          System.err.println(s"[profile] $funcName FAILED: ${error.getMessage}")
      })
    }
}
