package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the round-9 additions beyond the blanket
  * smoke/oracle gates.
  */
class Round9PropsSpec extends SparkSpec {

  test("d22: restart recovery is exactly-once — two runs, one checkpoint, batch-equal result") {
    val (df, info) =
      graft.streaming.StreamingDemo.restartRecoveryWithInfo(spark, sf0001)
    // the recovery genuinely happened: the SAME logical query (one id)
    // executed as two DISTINCT runs (two runIds), and each run
    // committed at least one batch into the shared checkpoint, with
    // run 2's batch numbering continuing where run 1 stopped.
    assert(info.queryId1 == info.queryId2,
      "restart must resume the same query id from the checkpoint")
    assert(info.runId1 != info.runId2, "two runs must have distinct runIds")
    assert(info.batchesRun1.nonEmpty, "run 1 committed no batch")
    assert(info.batchesRun2.nonEmpty, "run 2 committed no batch")
    assert(info.batchesRun2.min > info.batchesRun1.max,
      s"run 2 batches ${info.batchesRun2} must extend run 1's ${info.batchesRun1}")
    // no row lost or doubled: the two-run output equals the one-shot
    // batch aggregate restricted to watermark-closed windows.
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.map(t => (t._1, t._2)).distinct.size == got.size,
      "duplicate (window, type) rows — a batch was doubled across the restart")
    val ev = graft.util.Tables.events(spark, sf0001)
    val mxS = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000000L
    val exp = ev
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(expr("unix_micros(ws) div 1000000").as("start_s"),
        col("event_type"), col("cnt"))
      .filter(col("start_s") + 7200L <= mxS)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.toSet == exp.toSet,
      s"restart output diverged from batch: missing=${exp.toSet -- got.toSet} extra=${got.toSet -- exp.toSet}")
    assert(got.nonEmpty)
  }
}
