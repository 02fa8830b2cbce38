package graft.operators

import graft.SparkSpec

/** Round-13 operators: c77 ANN index delete-maintenance (b100/b101's
  * connector-level proofs live in GraftMemCatalogSpec /
  * GraftMemSchemaEvolutionSpec).
  */
class Round13PropsSpec extends SparkSpec {

  test("c77: deleted ids are STRUCTURALLY absent from the search " +
      "output, and the index live set is exactly c74's minus the " +
      "deleted slice") {
    val out = graft.SparkEntry.queries("c77_index_delete_maintenance")(
      spark, sf0001).collect()
    assert(out.nonEmpty)
    // neighbor_id is column 2 of (probe_id, rank, neighbor_id, ...)
    val returned = out.map(_.getLong(2)).toSet
    assert(returned.forall(_ % 10 != 3),
      s"search returned deleted ids: ${returned.filter(_ % 10 == 3)}")
    // recall over the SURVIVING ground truth holds the floor c74
    // itself achieves on this corpus — deletes must not degrade the
    // index beyond the (tiny-corpus-noisy) baseline (recall_bp is
    // column 5; one sample per probe)
    def meanRecall(rows: Array[org.apache.spark.sql.Row]): Long = {
      val per = rows.groupBy(_.getLong(0)).view
        .mapValues(_.head.getLong(5)).toMap
      per.values.sum / per.size
    }
    val base = meanRecall(graft.SparkEntry.queries("c74_index_search")(
      spark, sf0001).collect())
    val mean = meanRecall(out)
    assert(mean >= base - 2000L,
      s"mean recall_bp over survivors fell to $mean (c74 base $base)")
    // index live set = c74's universe minus the ≡3 (mod 10) slice
    val idx2 = TierC.c77Build(spark, sf0001)
    val (idx, _) = TierC.c74Build(spark, sf0001)
    val full = spark.table(idx).count()
    val deleted = spark.table(idx)
      .filter("vec_id % 10 = 3").count()
    assert(spark.table(idx2).count() == full - deleted)
    assert(spark.table(idx2).filter("vec_id % 10 = 3").count() == 0L)
  }

  test("c77 maintenance is training-free and delete-shaped: the index " +
      "is the equality-delete MoR flavor, its history is exactly " +
      "insert + one delete commit, and compaction changes nothing") {
    val idx2 = TierC.c77Build(spark, sf0001)
    // the MoR flavor's metadata columns exist (CoW exposes _group
    // instead) — and the delete key (first schema column) is vec_id,
    // b91's equality addressing
    assert(spark.sql(s"SELECT _pos, _row_id FROM $idx2 LIMIT 1")
      .collect().nonEmpty)
    assert(spark.table(idx2).schema.fieldNames.head == "vec_id")
    // history: create (0), INSERT-SELECT from c74's index (1), the
    // delete propagation (2) — no rebuild commits, no model writes
    val versions = spark.sql(
      s"SELECT version, live_rows FROM ${idx2}__history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(versions.map(_._1) == Seq(0L, 1L, 2L),
      s"expected create + insert + delete, got $versions")
    assert(versions(2)._2 < versions(1)._2,
      "the delete commit must shrink the live set")
    // the search result is stable across compaction: tombstones fold
    // into the base and the live set (hence the shortlist) is invariant
    val before = graft.SparkEntry.queries("c77_index_delete_maintenance")(
      spark, sf0001).collect().toSeq
    spark.sql(s"CALL graftmem.system.compact(" +
      s"'${idx2.stripPrefix("graftmem.")}')").collect()
    val after = graft.SparkEntry.queries("c77_index_delete_maintenance")(
      spark, sf0001).collect().toSeq
    assert(before == after,
      "compacting the index table must not change search results")
  }

  private def freshMor(name: String): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
    tbl
  }

  test("c79: index compaction folds every tombstone into one fully-" +
      "live file and the declared searches are byte-equal across it") {
    val out = graft.SparkEntry.queries("c79_index_compaction")(
      spark, sf0001).collect()
    assert(out.nonEmpty)
    // the two phases must be identical row for row (maintenance moves
    // bytes, never truth)
    val byPhase = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6))).sortBy(t => (t._1, t._2))
        .toSeq).toMap
    assert(byPhase.keySet == Set(0L, 1L))
    assert(byPhase(0L) == byPhase(1L),
      "pre- and post-compaction searches diverged")
    // no deleted ids anywhere (c77's contract carried through)
    assert(out.forall(_.getLong(3) % 10 != 3))
    // ledger mechanics: the c79-owned index table is now ONE fully-
    // live file with zero tombstone debt
    val suf = java.security.MessageDigest.getInstance("MD5")
      .digest(sf0001.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    val files = spark.table(s"graftmem.db.annidx3_${suf}__files")
      .select("live_rows", "deleted_rows").collect()
    assert(files.length == 1,
      s"expected one compacted file, got ${files.length}")
    assert(files.head.getLong(1) == 0L,
      "compaction must fold every tombstone")
  }

  test("b109: the IVM delta merge retires a group that counts to " +
      "zero — no ghost rows — and reads only the new commits") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_ivm")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_ivmagg")
    spark.sql("CREATE TABLE graftmem.db.spec_ivm " +
      "(key BIGINT, bal_cents BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.sql("CREATE TABLE graftmem.db.spec_ivmagg " +
      "(grp BIGINT, n BIGINT, bal_sum BIGINT)")
    spark.range(10)
      .selectExpr("id AS key", "id * 100 AS bal_cents")
      .writeTo("graftmem.db.spec_ivm").append() // v1
    spark.sql("INSERT INTO graftmem.db.spec_ivmagg " +
      "SELECT key % 2, count(*), sum(bal_cents) " +
      "FROM graftmem.db.spec_ivm GROUP BY key % 2")
    // v2: delete ALL odd keys — grp 1 must count to zero and vanish
    spark.sql("DELETE FROM graftmem.db.spec_ivm WHERE key % 2 = 1")
    val delta = spark.read.option("startingVersion", "2")
      .table("graftmem.db.spec_ivm__changes")
    // the incremental read sees ONLY v2's changes (the 5 deletes)
    assert(delta.count() == 5)
    assert(delta.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    delta.createOrReplaceTempView("spec_ivm_delta")
    spark.sql(
      """MERGE INTO graftmem.db.spec_ivmagg t USING (
        |  SELECT key % 2 AS grp,
        |    SUM(CASE WHEN _change_type = 'insert' THEN 1L ELSE -1L END)
        |      AS dn,
        |    SUM(CASE WHEN _change_type = 'insert' THEN bal_cents
        |        ELSE -bal_cents END) AS dbal
        |  FROM spec_ivm_delta GROUP BY key % 2) c
        |ON t.grp = c.grp
        |WHEN MATCHED AND t.n + c.dn = 0L THEN DELETE
        |WHEN MATCHED THEN UPDATE
        |  SET n = t.n + c.dn, bal_sum = t.bal_sum + c.dbal
        |WHEN NOT MATCHED THEN INSERT (grp, n, bal_sum)
        |  VALUES (c.grp, c.dn, c.dbal)""".stripMargin)
    val got = spark.table("graftmem.db.spec_ivmagg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 5L, 2000L)),
      s"grp 1 must be DELETED when it counts to zero, got $got")
  }

  test("b102 rewrite_sort: content-invariant, lineage preserved, " +
      "change feed untouched, tombstones folded, ranges disjoint") {
    val tbl = freshMor("spec_b102")
    // interleaved appends + a delete and an update in the middle
    spark.range(0, 20, 2).selectExpr("id AS key", "id * 10 AS v")
      .writeTo(tbl).append()
    spark.range(1, 20, 2).selectExpr("id AS key", "id * 10 AS v")
      .writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE key % 5 = 0")
    spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE key = 7")
    val before = spark.sql(
      s"SELECT key, v, _row_id FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val feedBefore = spark.table(s"${tbl}__changes").count()
    val res = spark.sql(s"CALL graftmem.system.rewrite_sort(" +
      s"'${tbl.stripPrefix("graftmem.")}', 3)").collect()(0)
    assert(res.getLong(1) == before.length,
      s"rows_sorted ${res.getLong(1)} != live ${before.length}")
    val after = spark.sql(
      s"SELECT key, v, _row_id FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // content AND row identity survive byte-for-byte (maintenance is
    // not an update) — including the updated row's inherited lineage
    assert(after == before,
      s"rewrite_sort changed content/lineage:\n$before\nvs\n$after")
    // the feed never sees maintenance
    assert(spark.table(s"${tbl}__changes").count() == feedBefore)
    // the ledger's post-rewrite ranges are tight and DISJOINT, and
    // tombstones are folded (every file fully live)
    val files = spark.sql(s"SELECT min_key, max_key, rows_written, " +
      s"live_rows FROM ${tbl}__files ORDER BY min_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(files.length == 3)
    assert(files.forall(f => f._3 == f._4), s"dead rows survived: " +
      files.mkString(", "))
    files.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"ranges overlap: $a vs $b")
    }
    // positions moved but _pos stays the row id: a row-level UPDATE
    // still works post-rewrite (the machinery kept addressing rows)
    spark.sql(s"UPDATE $tbl SET v = v + 100 WHERE key = 9")
    assert(spark.sql(s"SELECT v FROM $tbl WHERE key = 9")
      .collect()(0).getLong(0) == 190L)
  }

  test("d35: a checkpointed restart resumes IN THE FEED — the " +
      "snapshot is never re-served, and post-restart inserts flow") {
    val tbl = freshMor("spec_d35_restart")
    spark.range(10).selectExpr("id AS key", "id * 10 AS v")
      .writeTo(tbl).append() // the snapshot: 10 rows
    val sink = graft.util.TmpDir.fresh("d35spec-sink")
    val ckpt = graft.util.TmpDir.fresh("d35spec-ckpt")
    def run(): Unit = {
      val q = spark.readStream
        .option("graft.stream.deletes", "ignore").table(tbl)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // backfill: the 10 snapshot rows
    val schema = spark.readStream.table(tbl).schema
    assert(spark.read.schema(schema).parquet(sink).count() == 10L)
    // table moves while the stream is DOWN: 3 inserts + 1 delete land
    spark.range(100, 103).selectExpr("id AS key", "id AS v")
      .writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE key = 0")
    run() // restart from checkpoint
    val got = spark.read.schema(schema).parquet(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // 10 snapshot rows served ONCE + the 3 new inserts; the delete is
    // ignored per mode; NOTHING re-snapshotted (key 0 still present
    // exactly once — it was live at subscription time)
    val expect = ((0L until 10L).map(k => (k, k * 10)) ++
      (100L until 103L).map(k => (k, k))).sorted
    assert(got == expect,
      s"restart must resume in the feed, got $got")
  }

  test("d35: the default deletes mode FAILS LOUDLY when the followed " +
      "feed contains a delete — never silent misrepresentation") {
    val tbl = freshMor("spec_d35_fail")
    spark.range(5).selectExpr("id AS key", "id AS v")
      .writeTo(tbl).append()
    val sink = graft.util.TmpDir.fresh("d35fail-sink")
    val ckpt = graft.util.TmpDir.fresh("d35fail-ckpt")
    val q = spark.readStream.table(tbl) // default: fail
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // the snapshot itself serves fine
      spark.sql(s"DELETE FROM $tbl WHERE key = 2")
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("graft.stream.deletes"),
        e.getMessage)
    } finally q.stop()
  }
}
