package graft.operators

import graft.SparkSpec

/** Round-12 operators: c74 persisted ANN index (build once / search
  * cold / maintain incrementally), d32's streaming WAP gate. b94/b95's
  * connector-level proofs live in GraftMemFilesSpec/GraftMemLineageSpec.
  */
class Round12PropsSpec extends SparkSpec {

  test("c74 == c72: the persisted-index search reproduces the " +
      "in-query search EXACTLY (the b75/b80 cross-check applied to ANN)") {
    val a = graft.SparkEntry.queries("c72_ivf_pq_search")(spark, sf0001)
      .collect().toSeq
    val b = graft.SparkEntry.queries("c74_index_search")(spark, sf0001)
      .collect().toSeq
    assert(a.nonEmpty && a == b,
      s"persisted-index search diverged: c72=${a.take(3)} c74=${b.take(3)}")
  }

  test("c74 search plan: reads the PREBUILT graftmem index, touches " +
      "raw vectors in exactly ONE scan (the re-rank fetch), zero " +
      "training in the plan") {
    val (idx, mdl) = TierC.c74Build(spark, sf0001)
    val ann = TierC.c74Search(spark, sf0001, idx, mdl, 5)
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && plan.contains("annidx"),
      s"the search must scan the persisted index table:\n$plan")
    val nParquet = "FileScan".r.findAllIn(plan).length
    assert(nParquet == 1,
      s"the search may touch raw embeddings only in the re-rank " +
        s"fetch (found $nParquet file scans):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the shortlist re-rank must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // and the search really searches: a well-formed per-probe top-5
    val rows = ann.collect()
    assert(rows.nonEmpty && rows.groupBy(_.getLong(0))
      .forall(_._2.length <= 5))
  }

  test("c75 agrees with its standalone members: h_bp == c12's score, " +
      "p_bp == c55's tertile mapped, c_bp == c63's clamped score, and " +
      "the combination is exactly (4h+3p+3c) div 10") {
    val ens = graft.SparkEntry.queries("c75_curation_ensemble")(
      spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(ens.nonEmpty)
    val c12m = graft.SparkEntry.queries("c12_text_quality")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    val c55m = graft.SparkEntry.queries("c55_perplexity_bucket")(
      spark, sf0001).collect()
      .map(r => r.getLong(0) -> (3L - r.getLong(3)) * 5000L).toMap
    val c63m = graft.SparkEntry.queries("c63_quality_classifier")(
      spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        math.max(0L, math.min(10000L, 5000L + r.getLong(2)))).toMap
    ens.foreach { case (id, (h, p, c, e, thr, kept)) =>
      assert(h == c12m(id), s"doc $id h_bp: $h vs ${c12m(id)}")
      assert(p == c55m(id), s"doc $id p_bp: $p vs ${c55m(id)}")
      assert(c == c63m(id), s"doc $id c_bp: $c vs ${c63m(id)}")
      assert(e == (4 * h + 3 * p + 3 * c) / 10)
      assert(kept == (e >= thr))
      assert(thr >= 3000L)
    }
    // the gate is a real gate: both outcomes occur on this corpus
    val keptN = ens.values.count(_._6)
    assert(keptN > 0 && keptN < ens.size,
      s"degenerate gate: $keptN/${ens.size} kept")
  }

  test("c75 plan: the threshold table joins broadcast; no cartesian") {
    val p = graft.SparkEntry.queries("c75_curation_ensemble")(
      spark, sf0001).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the #sources-bounded threshold table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("c76 fills c73's quotas with c75's best: per-source pick " +
      "counts equal c73's (same quota recipe), and every pick " +
      "dominates every non-pick of its source by (ens_bp, doc_id)") {
    val mix = graft.SparkEntry.queries("c76_quality_mixture")(
      spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(mix.nonEmpty)
    val hashMix = graft.SparkEntry.queries("c73_mixture_sample")(
      spark, sf0001).collect().map(r => r.getString(0))
    assert(mix.groupBy(_._1).view.mapValues(_.length).toMap ==
      hashMix.groupBy(identity).view.mapValues(_.length).toMap,
      "both samplers must honor the same quota table")
    val scores = graft.SparkEntry.queries("c75_curation_ensemble")(
      spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(5)))
    mix.groupBy(_._1).foreach { case (src, picks) =>
      val pickIds = picks.map(_._3).toSet
      val worstPick = picks.map(p => (p._4, p._3)).max(
        Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
      scores.filter(s => s._1 == src && !pickIds.contains(s._2))
        .foreach { case (_, id, ens) =>
          assert(ens < worstPick._1 ||
            (ens == worstPick._1 && id > worstPick._2),
            s"$src: non-pick doc $id (ens $ens) beats worst pick " +
              s"$worstPick")
        }
      // declared ens_bp values agree with c75's
      val byId = scores.collect { case (s, id, e) if s == src => id -> e }
        .toMap
      picks.foreach(p => assert(byId(p._3) == p._4))
    }
  }

  test("b99: graftmem scans report exact live statistics and the " +
      "catalog dimension broadcasts at PLAN time with no hint") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val cat = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
    def statsOf(name: String): (Long, Long) = {
      val scan = cat.loadTable(Identifier.of(Array("db"), name))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().asInstanceOf[
          org.apache.spark.sql.connector.read.SupportsReportStatistics]
      val st = scan.estimateStatistics()
      (st.numRows().getAsLong, st.sizeInBytes().getAsLong)
    }
    // CoW: exact rows
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_stats_cow")
    spark.sql("CREATE TABLE graftmem.db.spec_stats_cow (k BIGINT, v BIGINT)")
    spark.range(7).selectExpr("id AS k", "id AS v")
      .writeTo("graftmem.db.spec_stats_cow").append()
    val (nCow, szCow) = statsOf("spec_stats_cow")
    assert(nCow == 7L && szCow > 0L && szCow < 1000000L, s"($nCow, $szCow)")
    // MoR: LIVE rows after an update + delete (not raw log size)
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_stats_mor")
    spark.sql("CREATE TABLE graftmem.db.spec_stats_mor (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(10).selectExpr("id AS k", "id AS v")
      .writeTo("graftmem.db.spec_stats_mor").append()
    spark.sql("UPDATE graftmem.db.spec_stats_mor SET v = 99 WHERE k = 1")
    spark.sql("DELETE FROM graftmem.db.spec_stats_mor WHERE k IN (2, 3)")
    assert(statsOf("spec_stats_mor")._1 == 8L,
      "MoR stats must count LIVE rows, not log entries")
    // the declared join: pre-AQE plan already picks the broadcast
    val plan = graft.SparkEntry.queries("b99_stats_broadcast")(
      spark, sf0001).queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 25-row graftmem dim must broadcast at plan time:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("c74 build is incremental: the index table landed as TWO " +
      "append commits (initial build + maintenance), together " +
      "covering the full universe") {
    val (idx, mdl) = TierC.c74Build(spark, sf0001)
    // two landing commits: the initial slice and the late ≡7 slice
    val versions = spark.sql(
      s"SELECT version FROM ${idx}__history ORDER BY version").collect()
      .map(_.getLong(0)).toSeq
    assert(versions == Seq(0L, 1L, 2L),
      s"expected create + two append commits, got versions $versions")
    val n = spark.table(idx).count()
    val expected = spark.table(s"graftmem.db.${idx.split('.').last}")
      .count() // self-consistency read
    assert(n == expected)
    val universe = graft.util.Tables.embeddings(spark, sf0001)
      .filter("vec_id >= 8").count()
    assert(n == universe,
      s"index must cover the full universe: $n vs $universe")
    // the model artifact is exactly the 768 codebook cells
    assert(spark.table(mdl).count() == 8L * 64L + 4L * 4L * 16L)
  }
}
