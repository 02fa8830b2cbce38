package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering

/** The merge-on-read (SupportsDelta) table flavor behind b80, and the
  * commit-time optimistic-concurrency checks on BOTH row-level
  * flavors: MoR proves deltas-as-data (WriteDelta plan, base rows
  * never rewritten), CoW proves scanned-group validation (a group
  * changed between scan and commit is a loud rejection, not a lost
  * update).
  */
class GraftMemMorSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def freshMor(name: String): (String, GraftMemMorTable) = {
    val cat = catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    (tbl, cat.loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemMorTable])
  }

  private def writeInfo(t: org.apache.spark.sql.connector.catalog.Table) =
    new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "spec"
      override def schema(): org.apache.spark.sql.types.StructType =
        t.schema()
      override def options()
          : org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }

  test("MoR MERGE plans WriteDelta; base rows keep object identity") {
    val (tbl, table) = freshMor("spec_mor")
    spark.range(10).selectExpr("id AS key", "id * 100 AS bal")
      .writeTo(tbl).append()
    val baseBefore = table.base
    val rowObjsBefore = table.base.map(_._2)
    spark.range(5, 15).selectExpr("id AS key", "id * 1000 AS nb")
      .createOrReplaceTempView("spec_mor_batch")
    val m = spark.sql(
      s"""MERGE INTO $tbl t USING spec_mor_batch b ON t.key = b.key
         |WHEN MATCHED AND b.key % 2 = 0 THEN UPDATE SET bal = b.nb
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (key, bal) VALUES (b.key, b.nb)
         |""".stripMargin)
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("WriteDelta"),
      s"MoR MERGE must plan WriteDelta, got:\n$plan")
    assert(!plan.contains("ReplaceData"),
      "MoR MERGE must NOT fall back to the copy-on-write ReplaceData plan")
    // the base vector and every row object in it are UNTOUCHED — the
    // merge-on-read contract: changes land as deltas, never a rewrite
    assert(table.base eq baseBefore, "MERGE rewrote the base vector")
    assert(table.base.map(_._2).zip(rowObjsBefore).forall(p => p._1 eq p._2))
    // deltas: updates tombstone+reinsert, deletes tombstone, inserts add
    assert(table.deleted == Set(5L, 6L, 7L, 8L, 9L),
      s"tombstones: ${table.deleted}")
    assert(table.deltaInserts.map(r =>
      (GraftCell.asLong(r._2(0)), GraftCell.asLong(r._2(1)))).sorted ==
      Seq((6L, 6000L), (8L, 8000L)) ++ (10L to 14L).map(k => (k, k * 1000L)))
    // read-time merge produces the post-merge content
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect =
      (0L to 4L).map(k => (k, k * 100)) ++
        Seq((6L, 6000L), (8L, 8000L)) ++
        (10L to 14L).map(k => (k, k * 1000))
    assert(got == expect)
  }

  test("MoR UPDATE and DELETE also plan WriteDelta; _pos is queryable") {
    val (tbl, table) = freshMor("spec_mor_ud")
    spark.range(6).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    val u = spark.sql(s"UPDATE $tbl SET bal = bal + 100 WHERE key < 2")
    assert(u.queryExecution.executedPlan.toString.contains("WriteDelta"))
    spark.sql(s"DELETE FROM $tbl WHERE key = 5")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 100L), (1L, 101L), (2L, 2L), (3L, 3L), (4L, 4L)))
    assert(table.base.length == 6, "base must never shrink under MoR")
    // _pos row ids are stable and unique, including for delta-inserts
    val pos = spark.sql(s"SELECT _pos FROM $tbl").collect().map(_.getLong(0))
    assert(pos.distinct.length == pos.length)
  }

  test("MoR commit conflict: same row tombstoned twice → loud rejection") {
    val (tbl, table) = freshMor("spec_mor_conflict")
    spark.range(8).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    def deltaDelete(positions: Seq[Long]) = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.DELETE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().asInstanceOf[
          org.apache.spark.sql.connector.write.SupportsDelta]
      // scan (pins the snapshot the operation reads)…
      op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()
      // …then the delta write
      val bw = op.newWriteBuilder(writeInfo(table)).build().toBatch
      val w = bw.createBatchWriterFactory(null)
        .asInstanceOf[org.apache.spark.sql.connector.write
          .DeltaWriterFactory].createWriter(0, 0L)
      positions.foreach { p =>
        w.delete(null, org.apache.spark.sql.catalyst.InternalRow(p))
      }
      (bw, Array(w.commit()))
    }
    // two operations scan the SAME snapshot, then commit in turn
    val (bw1, m1) = deltaDelete(Seq(2L, 3L))
    val (bw2, m2) = deltaDelete(Seq(3L, 4L)) // overlaps on pos 3
    val (bw3, m3) = deltaDelete(Seq(6L))     // disjoint
    bw1.commit(m1)
    val err = intercept[GraftMemCommitConflictException] { bw2.commit(m2) }
    assert(err.getMessage.contains("3"))
    bw3.commit(m3) // disjoint rows: lands even though bw1 committed first
    val keys = spark.table(tbl).collect().map(_.getLong(0)).sorted.toSeq
    assert(keys == Seq(0L, 1L, 4L, 5L, 7L),
      s"post-commit content wrong: $keys")
  }

  test("CoW commit conflict: scanned group changed after scan → rejection; " +
      "disjoint-group interleave commits") {
    val cat = catalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_cow_cf")
    spark.sql("CREATE TABLE graftmem.db.spec_cow_cf " +
      "(key BIGINT, g BIGINT, bal BIGINT) PARTITIONED BY (g)")
    spark.range(12).selectExpr("id AS key", "id % 3 AS g", "id * 10 AS bal")
      .writeTo("graftmem.db.spec_cow_cf").append()
    val table = cat.loadTable(Identifier.of(Array("db"), "spec_cow_cf"))
      .asInstanceOf[GraftMemTable]

    // a row-level operation whose scan reads ONLY group 1
    def opOnGroup1() = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.UPDATE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build()
      val scan = op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
      scan.asInstanceOf[SupportsRuntimeV2Filtering].filter(Array(
        new Predicate("IN",
          Array(Expressions.column("_group"), Expressions.literal(1L)))))
      scan.toBatch.planInputPartitions()
      op
    }
    def commitReplacement(
        op: org.apache.spark.sql.connector.write.RowLevelOperation,
        rows: Seq[(Long, Long, Long)]): Unit = {
      val bw = op.newWriteBuilder(writeInfo(table)).build().toBatch
      val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
      rows.foreach { case (k, g, b) =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(k, g, b))
      }
      bw.commit(Array(w.commit()))
    }

    // Interleave 1 (disjoint): op scans group 1, then an append lands
    // in group 2, then the op commits — group 1 is unchanged since the
    // scan, so the rewrite is still valid and MUST land.
    val opOk = opOnGroup1()
    spark.sql(
      "INSERT INTO graftmem.db.spec_cow_cf VALUES (100, 2, 999)")
    commitReplacement(opOk, Seq((1L, 1L, 1111L), (4L, 1L, 4444L),
      (7L, 1L, 7777L), (10L, 1L, 10101L)))
    val afterOk = spark.table("graftmem.db.spec_cow_cf")
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(afterOk.contains((1L, 1111L)) && afterOk.contains((100L, 999L)))

    // Interleave 2 (overlap): op scans group 1, then an append lands
    // IN group 1 — committing the rewrite would silently drop that
    // appended row (lost update), so the commit must throw.
    val opConflict = opOnGroup1()
    spark.sql(
      "INSERT INTO graftmem.db.spec_cow_cf VALUES (200, 1, 777)")
    val err = intercept[GraftMemCommitConflictException] {
      commitReplacement(opConflict, Seq((1L, 1L, 9999L)))
    }
    assert(err.getMessage.contains("group"))
    // the interleaved append survived; the rejected rewrite left no trace
    val bal200 = spark.table("graftmem.db.spec_cow_cf")
      .where("key = 200").collect().map(_.getLong(2)).toSeq
    assert(bal200 == Seq(777L))
    val bal1 = spark.table("graftmem.db.spec_cow_cf")
      .where("key = 1").collect().map(_.getLong(2)).toSeq
    assert(bal1 == Seq(1111L), "rejected commit must not have applied")
  }

  test("b82: CALL graftmem.system.compact folds deltas; table stays " +
      "operational across the compaction") {
    val (tbl, table) = freshMor("spec_mor_cpct")
    spark.range(10).selectExpr("id AS key", "id * 100 AS bal")
      .writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE key % 2 = 1")      // 5 tombstones
    spark.sql(s"UPDATE $tbl SET bal = bal + 7 WHERE key = 4") // +1 ts +1 ins
    assert(table.deleted.size == 6 && table.deltaInserts.length == 1)
    val before = spark.table(tbl).orderBy("key").collect().toSeq
    val res = spark.sql(
      s"CALL graftmem.system.compact('db.spec_mor_cpct')").collect()
    assert(res.length == 1)
    assert(res(0).getLong(0) == 6L, s"tombstones_dropped: ${res(0)}")
    assert(res(0).getLong(1) == 1L, s"inserts_folded: ${res(0)}")
    assert(res(0).getLong(2) == 5L, s"live_rows: ${res(0)}")
    // delta log folded away; content identical (compaction is invisible)
    assert(table.deleted.isEmpty && table.deltaInserts.isEmpty)
    assert(table.base.length == 5)
    assert(spark.table(tbl).orderBy("key").collect().toSeq == before)
    // the compacted table remains fully row-level operational
    spark.sql(s"UPDATE $tbl SET bal = bal + 1 WHERE key = 0")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (2L, 200L), (4L, 407L), (6L, 600L),
      (8L, 800L)))
    // unknown table and copy-on-write targets fail loudly
    val e1 = intercept[Exception] {
      spark.sql("CALL graftmem.system.compact('db.nope')").collect()
    }
    assert(e1.getMessage.contains("no graftmem table"))
  }

  test("b83: the change feed carries logical changes only — append, " +
      "delete with preimage, update as D+I; compaction absent") {
    val (tbl, table) = freshMor("spec_mor_cdc")
    spark.range(4).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append()                                  // v1
    spark.sql(s"DELETE FROM $tbl WHERE key = 1")              // v2
    spark.sql(s"UPDATE $tbl SET bal = bal + 5 WHERE key = 2") // v3
    spark.sql("CALL graftmem.system.compact('db.spec_mor_cdc')") // v4
      .collect()
    val ch = spark.table(s"${tbl}__changes")
      .select("_commit_version", "_change_type", "key", "bal")
      .orderBy("_commit_version", "_change_type", "key")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val expect = Seq(
      (1L, "insert", 0L, 0L), (1L, "insert", 1L, 10L),
      (1L, "insert", 2L, 20L), (1L, "insert", 3L, 30L),
      (2L, "delete", 1L, 10L),                  // preimage content
      (3L, "delete", 2L, 20L), (3L, "insert", 2L, 25L), // update = D+I
    ) // v4 (compaction): no entries — feeds carry content, not layout
    assert(ch == expect, s"feed:\n${ch.mkString("\n")}")
    // incremental consumption: the version predicate narrows the read
    val since = spark.table(s"${tbl}__changes")
      .where("_commit_version >= 2").count()
    assert(since == 3)
    // the feed survives further merges after compaction
    spark.sql(s"DELETE FROM $tbl WHERE key = 3") // v5
    val v5 = spark.table(s"${tbl}__changes")
      .where("_commit_version = 5")
      .select("_change_type", "key", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(v5 == Seq(("delete", 3L, 30L)))
  }

  test("b80 declared query equals b75 — same CDC state via the other " +
      "write path") {
    val a = graft.SparkEntry.queries("b80_merge_on_read")(spark, sf0001)
      .collect().toSeq
    val b = graft.SparkEntry.queries("b75_merge_into")(spark, sf0001)
      .collect().toSeq
    assert(a == b,
      "merge-on-read and copy-on-write produced different post-merge state")
    assert(a.nonEmpty)
  }

  test("CoW full-scan op conflicts with ANY interleaved commit — even " +
      "one that emptied a group") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_cow_full")
    // UNPARTITIONED: the op scan has no runtime group filter, so its
    // scanned-group set is None (= everything)
    spark.sql("CREATE TABLE graftmem.db.spec_cow_full " +
      "(key BIGINT, bal BIGINT)")
    spark.range(6).selectExpr("id AS key", "id AS bal")
      .writeTo("graftmem.db.spec_cow_full").append()
    val table = catalog()
      .loadTable(Identifier.of(Array("db"), "spec_cow_full"))
      .asInstanceOf[GraftMemTable]
    val op = table.newRowLevelOperationBuilder(
      new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
        override def command() = org.apache.spark.sql.connector.write
          .RowLevelOperation.Command.DELETE
        override def options() =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }).build()
    op.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    // interleaved commit EMPTIES the table (a DELETE FROM): the old
    // validation derived touched groups from CURRENT rows and would
    // have let the stale rewrite silently resurrect everything
    spark.sql("DELETE FROM graftmem.db.spec_cow_full WHERE key >= 0")
    assert(spark.table("graftmem.db.spec_cow_full").count() == 0)
    val bw = op.newWriteBuilder(writeInfo(table)).build().toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(0L, 999L))
    val err = intercept[GraftMemCommitConflictException] {
      bw.commit(Array(w.commit()))
    }
    assert(err.getMessage.contains("full-scan"))
    assert(spark.table("graftmem.db.spec_cow_full").count() == 0,
      "the rejected stale rewrite resurrected deleted rows")
  }

  test("MoR conflict survives compaction: a tombstoned-then-compacted " +
      "position is a loud conflict, and the rejected commit leaves " +
      "no trace") {
    val (tbl, table) = freshMor("spec_mor_vanish")
    spark.range(6).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append()
    def deltaDeleteOp() = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.DELETE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().asInstanceOf[
          org.apache.spark.sql.connector.write.SupportsDelta]
      op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()
      op
    }
    val opB = deltaDeleteOp() // scans BEFORE the concurrent delete
    spark.sql(s"DELETE FROM $tbl WHERE key = 3") // tombstones pos 3
    spark.sql(s"CALL graftmem.system.compact('db.spec_mor_vanish')")
      .collect() // pos 3 gone entirely; `deleted` cleared
    val logBefore = table.changeLog.length
    val delBefore = table.deleted
    val bwB = opB.newWriteBuilder(writeInfo(table)).build().toBatch
    val wB = bwB.createBatchWriterFactory(null)
      .asInstanceOf[org.apache.spark.sql.connector.write
        .DeltaWriterFactory].createWriter(0, 0L)
    wB.delete(null, org.apache.spark.sql.catalyst.InternalRow(3L))
    val err = intercept[GraftMemCommitConflictException] {
      bwB.commit(Array(wB.commit()))
    }
    assert(err.getMessage.contains("no longer exist"))
    // rejected commit mutated NOTHING: no phantom tombstone, no
    // change-log entry, content intact
    assert(table.changeLog.length == logBefore)
    assert(table.deleted == delBefore)
    assert(spark.table(tbl).count() == 5)
  }

  test("change feed startingVersion: batch reads drop pre-boundary " +
      "history; a version past the tail reads empty; non-numeric is " +
      "loud") {
    val (tbl, _) = freshMor("spec_mor_sv")
    spark.range(4).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1: 4 inserts
    spark.sql(s"DELETE FROM $tbl WHERE key = 2") // v2: 1 delete
    spark.range(10, 12).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v3: 2 inserts
    val feed = s"${tbl}__changes"
    assert(spark.read.table(feed).count() == 7)
    val from2 = spark.read.option("startingVersion", "2").table(feed)
      .selectExpr("_commit_version", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(from2 == Seq((2L, "delete"), (3L, "insert"), (3L, "insert")))
    assert(spark.read.option("startingVersion", "99").table(feed)
      .count() == 0)
    val err = intercept[Exception] {
      spark.read.option("startingVersion", "nope").table(feed).count()
    }
    assert(err.getMessage.contains("numeric commit version"),
      err.getMessage)
  }

  test("scan custom metrics: tombstones_filtered and delta_rows_read " +
      "surface the read-time merge's cost, and compaction zeroes them") {
    val (tbl, _) = freshMor("spec_mor_metrics")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE key < 3") // 3 tombstones
    spark.range(100, 102).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // base append, not delta
    spark.sql(s"UPDATE $tbl SET bal = bal + 1 WHERE key = 5")
    // update = tombstone(5) + delta-insert → 4 tombstones, 1 delta row
    def metrics(): (Long, Long) = {
      val df = spark.table(tbl)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b
      }.head
      (scan.metrics("tombstones_filtered").value,
        scan.metrics("delta_rows_read").value)
    }
    assert(metrics() == ((4L, 1L)))
    spark.sql(s"CALL graftmem.system.compact('db.spec_mor_metrics')")
      .collect()
    assert(metrics() == ((0L, 0L)),
      "compaction must zero the read-time merge cost")
  }

  test("streaming startingVersion filters by VERSION, not just " +
      "initial log position — later sub-boundary commits stay out") {
    val (tbl, _) = freshMor("spec_mor_svs")
    spark.range(3).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    // subscribe from version 3 — past the current tail, so the
    // initial offset pins the tail POSITION; v2 commits after
    // subscribe and must STILL be excluded (it is below the boundary)
    val q = spark.readStream.option("startingVersion", "3")
      .table(s"${tbl}__changes")
      .writeStream.format("memory").queryName("spec_mor_svs_sink")
      .option("checkpointLocation",
        graft.util.TmpDir.fresh("svs-ckpt"))
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("spec_mor_svs_sink").count() == 0)
      spark.range(10, 12).selectExpr("id AS key", "id AS bal")
        .writeTo(tbl).append() // v2 — below the boundary
      q.processAllAvailable()
      assert(spark.table("spec_mor_svs_sink").count() == 0,
        "sub-boundary commit leaked into a startingVersion stream")
      spark.sql(s"DELETE FROM $tbl WHERE key = 0") // v3 — at boundary
      q.processAllAvailable()
      val got = spark.table("spec_mor_svs_sink")
        .selectExpr("_commit_version", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((3L, "delete")))
    } finally q.stop()
  }

  test("streaming epoch ledger is O(queries), not O(epochs)") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_ledger")
    spark.sql("CREATE TABLE graftmem.db.spec_ledger (k BIGINT, v BIGINT)")
    val table = catalog()
      .loadTable(Identifier.of(Array("db"), "spec_ledger"))
      .asInstanceOf[GraftMemTable]
    val sw = table.newWriteBuilder(writeInfo(table)).build().toStreaming
    (0L until 50L).foreach { epoch =>
      val w = sw.createStreamingWriterFactory(null).createWriter(0, 0L, epoch)
      w.write(org.apache.spark.sql.catalyst.InternalRow(epoch, epoch))
      sw.commit(epoch, Array(w.commit()))
    }
    assert(spark.table("graftmem.db.spec_ledger").count() == 50)
    assert(table.lastCommittedEpoch.size() == 1,
      "ledger must hold one max-epoch entry per query, not one per epoch")
    assert(table.lastCommittedEpoch.get("spec") == 49L)
  }
}
