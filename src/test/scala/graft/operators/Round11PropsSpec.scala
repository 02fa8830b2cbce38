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

  test("c72: IVF-PQ search earns its keep — recall@5 vs brute force " +
      "clears the pinned floor, and the output is a well-formed " +
      "per-probe top-5") {
    val rows = graft.SparkEntry.queries("c72_ivf_pq_search")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (pid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"probe $pid: ranks not 1..k: ${rs.map(_._2).toSeq}")
      // exact re-rank: sims non-increasing with rank
      val byRank = rs.sortBy(_._2).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => b <= a })
      assert(rs.forall(_._4 > 0L), "ADC distances must be positive")
      assert(rs.map(_._6).distinct.length == 1,
        "recall_bp is a per-probe constant")
    }
    // the pinned floor: measured 4000 bp average on this corpus
    // (uniform unit-sphere embeddings — ANN's worst case); 2000 is
    // the regression alarm, not the aspiration
    val perProbe = rows.groupBy(_._1).map(_._2.head._6)
    val avg = perProbe.sum.toDouble / perProbe.size
    assert(avg >= 2000.0,
      s"avg recall@5 fell below the 2000 bp floor: $avg")
  }

  test("c71: the trained classifier tracks its weak-label teacher on " +
      "the held-out split") {
    import org.apache.spark.sql.functions._
    val pred = graft.SparkEntry.queries("c71_classifier_train")(
      spark, sf0001)
    val rows = pred.collect()
    assert(rows.nonEmpty)
    // the holdout is ~1/5 of the corpus by the hash split
    val total = graft.util.Tables.documents(spark, sf0001).count()
    assert(rows.length < total / 3 && rows.length > total / 10,
      s"holdout size ${rows.length} of $total looks wrong")
    // scores are real evidence sums, not one constant
    assert(rows.map(_.getLong(2)).distinct.length > 5)
    // accuracy vs the weak-label teacher on the holdout
    val weak = graft.util.Tables.documents(spark, sf0001)
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("stop_cnt",
        size(expr("filter(w, x -> x IN ('the','a','of','and','to'))"))
          .cast("long"))
      .select(col("doc_id"), (col("n_words") >= 10 &&
        expr("stop_cnt * 10000 div n_words") >= 200).as("good"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val agree = rows.count(r => r.getBoolean(3) == weak(r.getLong(0)))
    assert(agree.toDouble / rows.length >= 0.75,
      s"holdout agreement ${agree}/${rows.length} below 75%")
  }

  test("c73: mixture invariants — quotas respect the temperature " +
      "weights, never exceed source sizes, and the total honors the " +
      "target budget") {
    val rows = graft.SparkEntry.queries("c73_mixture_sample")(
      spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 200,
      s"picked ${rows.length} of a 200 budget")
    val bySource = rows.groupBy(_._1)
    val counts = graft.util.Tables.documents(spark, sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def isqrt(n: Long): Long = {
      var r = math.floor(math.sqrt(n.toDouble)).toLong
      if (r * r > n) r -= 1
      if ((r + 1) * (r + 1) <= n) r += 1
      r
    }
    val wsum = counts.values.map(isqrt).sum
    bySource.foreach { case (src, picked) =>
      // the declared weight IS the integer sqrt of the source size
      assert(picked.map(_._4).distinct.toSeq == Seq(isqrt(counts(src))),
        s"$src: weight drifted")
      // quota: floor(200*w/Σw) capped at the source size
      val k = math.min(counts(src), 200L * isqrt(counts(src)) / wsum)
      assert(picked.length.toLong == k,
        s"$src: picked ${picked.length}, quota $k")
      // ranks are 1..k and picks are distinct docs
      assert(picked.map(_._2).sorted.toSeq == (1L to k).toSeq)
      assert(picked.map(_._3).distinct.length == picked.length)
    }
    // small sources are UP-weighted relative to size: pick share ≥
    // size share for the smallest source (the recipe's whole point)
    val smallest = counts.minBy(_._2)
    val pickShare = bySource(smallest._1).length.toDouble / rows.length
    val sizeShare = smallest._2.toDouble / counts.values.sum
    assert(pickShare >= sizeShare,
      s"temperature failed to up-weight the smallest source: " +
        s"pick $pickShare vs size $sizeShare")
  }

  test("plan shapes: c71 serves the model via broadcast join; c72's " +
      "shortlist re-rank joins broadcast; neither plans a cartesian") {
    val p71 = graft.SparkEntry.queries("c71_classifier_train")(
      spark, sf0001).queryExecution.executedPlan.toString
    assert(p71.contains("BroadcastHashJoin"),
      s"c71 must broadcast the vocabulary-sized weight table:\n$p71")
    assert(!p71.contains("CartesianProduct") &&
      !p71.contains("BroadcastNestedLoopJoin"))
    val p72 = graft.SparkEntry.queries("c72_ivf_pq_search")(
      spark, sf0001).queryExecution.executedPlan.toString
    assert(p72.contains("BroadcastHashJoin"),
      s"c72's shortlist must join embeddings broadcast:\n$p72")
    assert(!p72.contains("CartesianProduct"))
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
