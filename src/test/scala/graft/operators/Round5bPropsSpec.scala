package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Round-5 second batch: gap-fill interpolation (b51), the flagship Q3
  * composite (b52), exact grouped percentiles (b53), Zipf corpus stats
  * (c52), bigram LM scoring (c53) — operator properties plus the
  * physical-plan shapes each one claims in its Scaladoc.
  */
class Round5bPropsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def executed(name: String): String = {
    val df = q(name)
    df.count() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("b51: non-gap rows unchanged; interpolated values between their neighbors") {
    import spark.implicits._
    val ev = graft.util.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"value",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val byId = ev.map(e => e._1 -> e).toMap
    val rows = q("b51_gap_fill").collect()
    assert(rows.length == ev.length)
    rows.foreach { r =>
      val (id, gap, filled) = (r.getAs[Long]("event_id"),
        r.getAs[Boolean]("was_gap"), r.getAs[Double]("filled"))
      val (_, user, typ, value, us) = byId(id)
      assert(gap == (typ == "error"))
      if (!gap) assert(filled == value, s"event $id")
      else {
        // neighbors in (us, event_id) order among this user's non-error rows
        val series = ev.filter(e => e._2 == user && e._3 != "error")
          .sortBy(e => (e._5, e._1))
        val prev = series.filter(e =>
          e._5 < us || (e._5 == us && e._1 < id)).lastOption
        val next = series.find(e => e._5 > us || (e._5 == us && e._1 > id))
        (prev, next) match {
          case (Some(p), Some(n)) if n._5 != p._5 =>
            val lo = math.min(p._4, n._4); val hi = math.max(p._4, n._4)
            assert(filled >= lo - 1e-9 && filled <= hi + 1e-9, s"event $id")
          case (Some(p), Some(_)) => assert(filled == p._4, s"event $id")
          case (Some(p), None)    => assert(filled == p._4, s"event $id")
          case (None, Some(n))    => assert(filled == n._4, s"event $id")
          case (None, None)       => assert(filled == -1.0, s"event $id")
        }
      }
    }
  }

  test("b51: four ignore-nulls navigations share one Exchange and one Sort") {
    val p = executed("b51_gap_fill")
    // user-keyed repartition: exactly one hashpartitioning exchange for
    // the window pass (the final ORDER BY adds its range exchange)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(1500))
    // both frame directions ride the same (user, us, event_id) sort:
    // sorts = 1 window sort + 1 presentation sort, nothing more
    assert("\\bSort \\[".r.findAllIn(p).length <= 2, p.take(1500))
  }

  test("b52: top-10 by exact revenue, TakeOrdered (no global sort), filters pushed") {
    val rows = q("b52_flagship_q3").collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)), "descending revenue")
    assert(revs.forall(_ > 0.0))
    val p = executed("b52_flagship_q3")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    // date predicates reach the scans
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("b53: quartiles monotone, within group min/max, histogram-aggregated") {
    import spark.implicits._
    val li = graft.util.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
    val rows = q("b53_percentile_exact").collect()
    assert(rows.length == li.map(_._1).distinct.length)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      // q1/q2/q3 are three scalar doubles (declared outputs are
      // scalar-only — QueryDef contract)
      val qs = Seq("q1", "q2", "q3").map(r.getAs[Double])
      assert(qs(0) <= qs(1) && qs(1) <= qs(2), qs.toString)
      val vals = li.filter(_._1 == flag).map(_._2)
      assert(qs(0) >= vals.min && qs(2) <= vals.max)
      assert(r.getAs[Long]("n") == vals.length.toLong)
      // cross-check the median against a direct computation
      val sorted = vals.sorted
      val pos = 0.5 * (sorted.length - 1)
      val (lo, hi) = (sorted(pos.toInt), sorted(math.ceil(pos).toInt))
      assert(qs(1) == lo + (pos - pos.toInt) * (hi - lo), flag)
    }
    // the exact percentile partial-aggregates (ObjectHashAggregate both
    // sides of the exchange) — the bounded-histogram scale claim
    val p = executed("b53_percentile_exact")
    assert(p.contains("ObjectHashAggregate"), p.take(1200))
    assert(p.contains("partial_percentile"), p.take(1200))
  }

  test("c52: zipfian text — negative slope, head bounded, counts consistent") {
    val rows = q("c52_zipf_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_distinct"); val nt = r.getAs[Long]("n_total")
      assert(nd > 0 && nt >= nd)
      val top1 = r.getAs[Long]("top1_bp")
      assert(top1 >= (10000L / nd) && top1 <= 10000L)
      // natural-ish text has a falling rank-frequency curve
      val slopeIdx = r.fieldIndex("zipf_slope")
      assert(!r.isNullAt(slopeIdx))
      assert(r.getDouble(slopeIdx) < 0.0)
    }
    // the top-100 head is bounded map-side before the shuffle
    val p = executed("c52_zipf_stats")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("b54: N filtered metrics from ONE scan; filtered counts bounded by n") {
    val rows = q("b54_agg_filter").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_heavy") <= n)
      assert(r.getAs[Long]("n_undiscounted") <= n)
      val ri = r.fieldIndex("rev_recent")
      if (!r.isNullAt(ri)) assert(r.getDouble(ri) > 0.0)
    }
    val p = executed("b54_agg_filter")
    // one lineitem scan feeds all four metrics, partial-aggregated
    assert("Scan parquet".r.findAllIn(p).length == 1, p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("c54: ranks contiguous, sims descending, edge count = min(k, bucketmates)") {
    val rows = q("c54_knn_graph").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nb_id"), r.getAs[Double]("sim")))
    // bucket occupancy from c51's declared (vec_id, bucket) columns
    val bucketOf = q("c51_semantic_dedup").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val occ = bucketOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val byVec = rows.groupBy(_._1)
    byVec.foreach { case (vid, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length), s"vec $vid")
      // sims non-increasing in rank order (rounded, so allow equality)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4, s"vec $vid")
        case _           => ()
      }
      assert(es.forall(_._3 != vid), s"vec $vid self-edge")
      assert(es.length == math.min(3, occ(bucketOf(vid)) - 1), s"vec $vid")
    }
    // singleton-bucket vectors emit nothing
    bucketOf.foreach { case (vid, b) =>
      if (occ(b) == 1) assert(!byVec.contains(vid), s"vec $vid")
    }
  }

  test("c55: tertiles balanced within ±1 per lang and ordered by surprisal key") {
    val rows = q("c55_perplexity_bucket").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("avg_sur_bp"), r.getAs[Long]("tertile")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)), lang)
      if (rs.length >= 3) {
        assert(sizes.values.max - sizes.values.min <= 1, s"$lang $sizes")
      }
      // the tertile is monotone in the (avg_sur_bp, doc_id) rank key
      val byKey = rs.sortBy(r => (r._3, r._2)).map(_._4)
      assert(byKey.sameElements(byKey.sorted), lang)
    }
  }

  test("c53: bigram surprisal bounded by context entropy; doc coverage exact") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val rows = q("c53_lm_bigram").collect()
    val expectDocs = docs.count(_._2.split(" ").length >= 2)
    assert(rows.length == expectDocs)
    val byId = docs.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nb = r.getAs[Long]("n_bigrams")
      assert(nb == byId(id).split(" ").length - 1, s"doc $id")
      val avg = r.getAs[Long]("avg_bits_bp")
      // 0 ≤ bits ≤ 63 per bigram (BIGINT count ratio)
      assert(avg >= 0L && avg <= 63L * 10000L)
    }
  }
}
