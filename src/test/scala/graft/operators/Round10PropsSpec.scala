package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operators: d24 state-store reader (closed + open = whole
  * stream) and b81's result invariance are covered here; the b81 plan
  * shape lives in RelationalPlanSpec and the b80/conflict machinery in
  * GraftMemMorSpec.
  */
class Round10PropsSpec extends SparkSpec {

  test("c69: MMR invariants — first pick is c3's rank-1, scores are " +
      "monotone non-increasing, picks are distinct pool members") {
    val mmr = graft.SparkEntry.queries("c69_mmr_diversify")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(mmr.nonEmpty)
    val top = graft.SparkEntry.queries("c3_similarity_topk")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rank1 = top.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    mmr.groupBy(_._1).foreach { case (pid, rows) =>
      val byRank = rows.sortBy(_._2)
      // greedy's first pick maximizes raw relevance = c3's rank 1
      assert(byRank.head._3 == rank1(pid),
        s"probe $pid: MMR rank1 ${byRank.head._3} != c3 ${rank1(pid)}")
      // the MMR objective is monotone: each later pick's score can
      // only be <= (penalty grows, candidate set shrinks)
      val scores = byRank.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => b <= a },
        s"probe $pid: scores not non-increasing: ${scores.toSeq}")
      // picks distinct
      assert(rows.map(_._3).distinct.length == rows.length)
    }
  }

  test("d26: the CDC stream delivers each change exactly once across " +
      "a mid-query merge — batch 1 carries ONLY the new version") {
    val out = graft.SparkEntry.queries("d26_stream_cdc_follow")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // three commit versions, both change types where applicable
    val versions = out.map(_._1).distinct.sorted
    assert(versions == Seq(1L, 2L, 3L), s"versions: $versions")
    // v1 is pure snapshot inserts (one per customer)
    val nCust = graft.util.Tables.customer(spark, sf0001).count()
    assert(out.collect { case (1L, "insert", n) => n }.sum == nCust)
    assert(!out.exists { case (1L, t, _) => t == "delete"; case _ => false })
    // v3 is a pure update round: equal delete and insert counts
    val d3 = out.collect { case (3L, "delete", n) => n }.sum
    val i3 = out.collect { case (3L, "insert", n) => n }.sum
    assert(d3 == i3 && d3 > 0, s"v3 delete=$d3 insert=$i3")
    // exactly-once: the feed's net effect (inserts − deletes) must
    // equal the LIVE table's row count — a re-delivered batch would
    // double whole change sets and break the balance (v1 is inserts
    // only, so doubling any version shifts the net)
    val net = out.collect { case (_, "insert", n) => n }.sum -
      out.collect { case (_, "delete", n) => n }.sum
    val suf = java.security.MessageDigest.getInstance("MD5")
      .digest(sf0001.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    val live = spark.table(s"graftmem.db.morcdc_$suf").count()
    assert(net == live, s"feed net $net != live rows $live")
  }

  test("d25: streaming MoR upsert equals d13's hand-rolled merge and " +
      "the one-shot batch aggregate") {
    val mor = graft.SparkEntry.queries("d25_stream_mor_upsert")(
      spark, sf0001).collect().toSeq
    val batch = graft.util.Tables.events(spark, sf0001)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("val_cents"))
      .orderBy("user_id").collect().toSeq
    assert(mor.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
      "cross-batch MERGE state diverged from the one-shot aggregate")
    assert(mor.nonEmpty)
  }

  test("d24: sink ∪ state partitions the aggregate exactly — " +
      "closed + open windows = the one-shot batch aggregate") {
    val df = graft.SparkEntry.queries("d24_state_store_reader")(
      spark, sf0001).cache()
    try {
      val bySrc = df.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySrc.getOrElse("sink", 0L) > 0, s"no closed windows: $bySrc")
      assert(bySrc.getOrElse("state", 0L) > 0,
        s"no open windows read from the checkpoint state: $bySrc")
      // no window appears in both halves (disjoint at the watermark)
      val dup = df.groupBy("start_s", "event_type").count()
        .filter(col("count") > 1).count()
      assert(dup == 0, "a window landed in both sink and state")
      // total event mass is conserved across the split
      val total = df.agg(sum("cnt")).head.getLong(0)
      val events = graft.util.Tables.events(spark, sf0001).count()
      assert(total == events, s"sum(cnt)=$total != events=$events")
      // the open windows are exactly the stream's trailing hour: every
      // state window end (+1 h delay) must be past the max event ts
      val maxTs = graft.util.Tables.events(spark, sf0001)
        .agg(expr("unix_micros(max(ts)) div 1000000")).head.getLong(0)
      val badState = df.filter(col("src") === "state")
        .filter(col("start_s") + 7200 <= maxTs).count()
      assert(badState == 0,
        "state holds a window the watermark should have closed")
    } finally df.unpersist()
  }
}
