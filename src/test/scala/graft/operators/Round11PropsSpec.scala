package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 operators: d29 state-metadata forensics, d30 state TTL
  * (the TTL-less twin is the contrast), b91/b92's query-level
  * cross-checks live in GraftMemEqDeleteSpec/GraftMemBranchSpec.
  */
class Round11PropsSpec extends SparkSpec {

  test("d29: the state-metadata row agrees with d24's statestore read " +
      "— open groups enumerated by metadata == open windows in state") {
    val meta = graft.SparkEntry.queries("d29_state_metadata")(
      spark, sf0001).collect()
    assert(meta.length == 1)
    val row = meta(0)
    assert(row.getString(0) == "stateStoreSave")
    assert(row.getString(1) == "default")
    assert(row.getLong(3) == 0L, s"min_batch_id: $row")
    assert(row.getLong(4) == 1L,
      s"one data batch + one watermark-flush batch expected: $row")
    // cross-check against d24: its 'state' half counts the same open
    // windows the d29 statestore read aggregated
    val d24 = graft.SparkEntry.queries("d24_state_store_reader")(
      spark, sf0001).collect()
    val openWindows = d24.count(_.getString(3) == "state")
    assert(row.getLong(5) == openWindows.toLong,
      s"d29 n_open_groups ${row.getLong(5)} != d24 state rows $openWindows")
  }

  test("d30 twin: with TTLConfig.NONE the second generation is " +
      "all-REJECTED — the TTL is what re-admits, not batch boundaries") {
    val noTtl = graft.streaming.StreamingDemo
      .streamStateTtlWith(spark, sf0001, ttlMs = None).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(noTtl.nonEmpty)
    val (g1, g2) = noTtl.partition(_._2 == 1L)
    assert(g1.forall(_._3), "generation 1 must claim")
    assert(g2.nonEmpty && g2.forall(!_._3),
      "without a TTL, generation 2 must be rejected by the live claims")
    // and the declared (TTL'd) query re-admits everything
    val ttl = graft.SparkEntry.queries("d30_state_ttl")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(ttl.forall(_._3),
      "expired claims must re-admit — the declared TTL behavior")
    assert(ttl.length == noTtl.length)
  }
}
