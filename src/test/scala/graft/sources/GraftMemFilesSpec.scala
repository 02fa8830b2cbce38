package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** b94 — file/partition-level metadata tables: `db.tbl__files` serves
  * the MoR file ledger (write-time stats + derived liveness),
  * compaction rewrites the ledger while the data summary stays
  * invariant, a compaction planner can pick files by delete ratio
  * from METADATA alone (the read c57 derives from a data scan), and
  * `db.tbl__partitions` serves per-group stats on the partitioned
  * copy-on-write flavor.
  */
class GraftMemFilesSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def fresh(name: String, ddl: String): String = {
    catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl $ddl")
    tbl
  }

  test("__files: write-time stats per landing commit, liveness " +
      "against tombstones, compaction rewrites the ledger while the " +
      "data summary is invariant") {
    val tbl = fresh("spec_files", "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(10).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // file 1: pos [0,10), keys 0..9
    spark.range(20, 25).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // file 2: pos [10,15), keys 20..24
    val f0 = spark.table(s"${tbl}__files").orderBy("file_id").collect()
    assert(f0.length == 2)
    assert(f0(0).getLong(0) == 1L && f0(0).getLong(1) == 1L &&
      f0(0).getLong(2) == 0L && f0(0).getLong(3) == 10L &&
      f0(0).getLong(4) == 10L && f0(0).getLong(5) == 10L &&
      f0(0).getLong(6) == 0L && f0(0).getLong(7) == 0L &&
      f0(0).getLong(8) == 9L, f0(0).toString)
    assert(f0(1).getLong(2) == 10L && f0(1).getLong(3) == 15L &&
      f0(1).getLong(7) == 20L && f0(1).getLong(8) == 24L,
      f0(1).toString)
    // delete keys 0..4 (file 1), update key 20 (file 2): tombstones
    // land against the RIGHT files, the update's re-insert is file 3
    spark.sql(s"DELETE FROM $tbl WHERE key < 5")
    spark.sql(s"UPDATE $tbl SET bal = 999 WHERE key = 20")
    val f1 = spark.table(s"${tbl}__files").orderBy("file_id").collect()
    assert(f1.length == 3, f1.mkString(";"))
    assert(f1(0).getLong(5) == 5L && f1(0).getLong(6) == 5L,
      s"file 1 live/deleted: ${f1(0)}")
    assert(f1(1).getLong(5) == 4L && f1(1).getLong(6) == 1L,
      s"file 2 live/deleted: ${f1(1)}")
    assert(f1(2).getLong(4) == 1L && f1(2).getLong(5) == 1L &&
      f1(2).getLong(7) == 20L && f1(2).getLong(8) == 20L,
      s"file 3 (update re-insert): ${f1(2)}")
    // a delete-only commit cuts NO data file
    assert(f1.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val summaryBefore = spark.sql(
      s"SELECT count(*), sum(bal) FROM $tbl").collect()(0)
    spark.sql(s"CALL graftmem.system.compact('db.spec_files')").collect()
    val f2 = spark.table(s"${tbl}__files").collect()
    assert(f2.length == 1, "compaction must fold the ledger to one file")
    assert(f2(0).getLong(2) == 0L && f2(0).getLong(3) == 16L,
      s"spanning file range: ${f2(0)}") // positions preserved → sparse
    assert(f2(0).getLong(4) == 10L && f2(0).getLong(5) == 10L &&
      f2(0).getLong(6) == 0L, s"compacted liveness: ${f2(0)}")
    val summaryAfter = spark.sql(
      s"SELECT count(*), sum(bal) FROM $tbl").collect()(0)
    assert(summaryBefore == summaryAfter,
      "compaction must be invisible to the data summary")
  }

  test("a compaction planner picks files by delete ratio from " +
      "__files metadata alone (the c57 read served from the manifest)") {
    val tbl = fresh("spec_files_plan", "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(100).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // file 1
    spark.range(100, 200).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // file 2
    // kill 40% of file 1, 2% of file 2
    spark.sql(s"DELETE FROM $tbl WHERE key < 40 OR key IN (100, 101)")
    // the planner: files whose dead fraction >= 30%, from metadata only
    val pick = spark.sql(
      s"""SELECT file_id FROM ${tbl}__files
         |WHERE deleted_rows * 100 >= 30 * rows_written
         |ORDER BY file_id""".stripMargin).collect().map(_.getLong(0))
    assert(pick.toSeq == Seq(1L),
      s"only file 1 crosses the 30% dead-row threshold, got " +
        pick.mkString(","))
  }

  test("__files on the equality-delete flavor: boundary-scoped " +
      "equality deletes count against liveness") {
    val tbl = fresh("spec_files_eq", "(key BIGINT NOT NULL, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // file 1
    spark.sql(s"UPDATE $tbl SET bal = 777 WHERE key = 3") // eq-delete + re-insert (file 2)
    val f = spark.table(s"${tbl}__files").orderBy("file_id").collect()
    assert(f.length == 2, f.mkString(";"))
    assert(f(0).getLong(5) == 9L && f(0).getLong(6) == 1L,
      s"file 1 must show the equality-deleted row as dead: ${f(0)}")
    assert(f(1).getLong(5) == 1L && f(1).getLong(6) == 0L,
      s"the re-insert survives its own commit's boundary: ${f(1)}")
  }

  test("__partitions on the partitioned CoW flavor: per-group counts " +
      "+ last-modified version; declared-empty partitions listed") {
    val tbl = fresh("spec_parts",
      "(g BIGINT, v BIGINT) PARTITIONED BY (g)")
    spark.range(20).selectExpr("id % 4 AS g", "id AS v")
      .writeTo(tbl).append() // v1: groups 0..3, 5 rows each
    spark.sql(s"ALTER TABLE $tbl ADD PARTITION (g = 9)")
    val p0 = spark.table(s"${tbl}__partitions").orderBy("group_key")
      .collect()
    assert(p0.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L), (9L, 0L)),
      p0.mkString(";"))
    assert(p0.filter(_.getLong(0) != 9L).forall(_.getLong(2) == 1L))
    // a group-pruned MERGE bumps ONLY the touched group's version
    spark.range(1).selectExpr("CAST(2 AS BIGINT) AS g",
      "CAST(1000 AS BIGINT) AS v").createOrReplaceTempView("sp_b")
    spark.sql(
      s"""MERGE INTO $tbl t USING sp_b b ON t.g = b.g AND t.v = 2
         |WHEN MATCHED THEN UPDATE SET v = b.v""".stripMargin)
    val p1 = spark.table(s"${tbl}__partitions").orderBy("group_key")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(p1(2L) == 2L, s"touched group must show the new version: $p1")
    assert(p1(0L) == 1L && p1(1L) == 1L && p1(3L) == 1L,
      s"untouched groups keep their version: $p1")
  }

  test("b96 rewrite_files: only threshold-crossing files rewrite; " +
      "content is invariant, the kept file byte-identical, lineage " +
      "ids preserved across the position move with luv untouched") {
    val tbl = fresh("spec_rwf", "(key BIGINT NOT NULL, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .repartition(1).sortWithinPartitions("key")
      .writeTo(tbl).append() // file 1, ids 0..9
    spark.sql(s"UPDATE $tbl SET bal = 100 WHERE key = 2") // v2 (file 2)
    spark.sql(s"DELETE FROM $tbl WHERE key IN (0, 1)") // v3: file 1 30% dead
    spark.range(20, 30).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // file 3, fully live
    val contentBefore = spark.sql(
      s"SELECT key, bal, _row_id, _last_updated_version FROM $tbl")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val f3Before = spark.table(s"${tbl}__files")
      .filter("file_id = 3").collect().toSeq
    val res = spark.sql(
      "CALL graftmem.system.rewrite_files('db.spec_rwf', 2000L)")
      .collect()(0)
    // file 1 (3/10 dead) and file 2 (the update re-insert is fully
    // live — never a victim) → exactly one rewrite
    assert(res.getLong(0) == 1L && res.getLong(1) == 7L &&
      res.getLong(2) == 2L, res.toString)
    val contentAfter = spark.sql(
      s"SELECT key, bal, _row_id, _last_updated_version FROM $tbl")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(contentAfter == contentBefore,
      "rewrite must preserve content, row ids AND last-updated versions")
    val after = spark.table(s"${tbl}__files").orderBy("file_id").collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L),
      after.mkString(";"))
    assert(after(1).toSeq == f3Before.head.toSeq,
      "the healthy file's ledger row must be byte-identical")
    assert(after.forall(_.getLong(6) == 0L),
      s"post-rewrite no file may carry dead rows here: ${after.mkString(";")}")
    // row-level operations keep working against the rewritten layout
    spark.sql(s"UPDATE $tbl SET bal = 777 WHERE key = 5")
    val l = spark.sql(
      s"SELECT _row_id, _last_updated_version FROM $tbl WHERE key = 5")
      .collect()(0)
    assert(l.getLong(0) == 5L && l.getLong(1) > 4L, l.toString)
  }

  test("b96 rewrite_files: an all-dead victim vanishes without a " +
      "replacement file; no victims is a version-preserving no-op") {
    val tbl = fresh("spec_rwf_edge", "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(4).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // file 1
    spark.range(10, 14).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // file 2
    spark.sql(s"DELETE FROM $tbl WHERE key < 4") // file 1 fully dead
    val res = spark.sql(
      "CALL graftmem.system.rewrite_files('db.spec_rwf_edge', 5000L)")
      .collect()(0)
    assert(res.getLong(0) == 1L && res.getLong(1) == 0L &&
      res.getLong(2) == 1L, res.toString)
    val after = spark.table(s"${tbl}__files").collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(2L),
      s"the all-dead file must vanish: ${after.mkString(";")}")
    assert(spark.table(tbl).count() == 4L)
    // nothing crosses the threshold now → no-op, version untouched
    val vBefore = spark.sql(s"SELECT max(version) FROM ${tbl}__history")
      .collect()(0).getLong(0)
    val res2 = spark.sql(
      "CALL graftmem.system.rewrite_files('db.spec_rwf_edge', 5000L)")
      .collect()(0)
    assert(res2.getLong(0) == 0L && res2.getLong(2) == 1L)
    val vAfter = spark.sql(s"SELECT max(version) FROM ${tbl}__history")
      .collect()(0).getLong(0)
    assert(vAfter == vBefore, "a no-op rewrite must not commit")
  }

  test("b96 conflict surface: a positional delta scanned BEFORE a " +
      "rewrite rejects loudly (its positions vanished); an " +
      "equality delta composes safely (key addressing is " +
      "position-independent)") {
    def writeInfo(t: org.apache.spark.sql.connector.catalog.Table) =
      new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = "spec-rwc"
        override def schema(): org.apache.spark.sql.types.StructType =
          t.schema()
        override def options()
            : org.apache.spark.sql.util.CaseInsensitiveStringMap =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }
    def deltaOp(table: GraftMemMorTable) = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.MERGE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().asInstanceOf[
          org.apache.spark.sql.connector.write.SupportsDelta]
      op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions() // pin the scan version
      op.newWriteBuilder(writeInfo(table)).build().toBatch
    }
    val cat = catalog()
    // POSITIONAL: the delta addresses rows by _pos; a rewrite moves
    // them → the in-flight commit's positions no longer exist
    val tp = fresh("spec_rwc_pos", "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .writeTo(tp).append()
    spark.sql(s"DELETE FROM $tp WHERE key < 4") // 40% dead
    val tpTbl = cat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("db"), "spec_rwc_pos"))
      .asInstanceOf[GraftMemMorTable]
    val bwPos = deltaOp(tpTbl) // scans pre-rewrite positions
    spark.sql(
      "CALL graftmem.system.rewrite_files('db.spec_rwc_pos', 2000L)")
      .collect()
    val wPos = bwPos.createBatchWriterFactory(null)
      .asInstanceOf[org.apache.spark.sql.connector.write
        .DeltaWriterFactory].createWriter(0, 0L)
    // tombstone position 5 (key 5's pre-rewrite position) — moved
    wPos.delete(null, org.apache.spark.sql.catalyst.InternalRow(5L))
    val err = intercept[GraftMemCommitConflictException] {
      bwPos.commit(Array(wPos.commit()))
    }
    assert(err.getMessage.contains("no longer exist"), err.getMessage)
    assert(spark.table(tp).count() == 6L, "rejected commit left traces")
    // EQUALITY: key addressing survives the move — the same
    // interleaving commits cleanly and kills the moved row
    val te = fresh("spec_rwc_eq", "(key BIGINT NOT NULL, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .writeTo(te).append()
    spark.sql(s"DELETE FROM $te WHERE key < 4")
    val teTbl = cat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("db"), "spec_rwc_eq"))
      .asInstanceOf[GraftMemMorTable]
    val bwEq = deltaOp(teTbl)
    spark.sql(
      "CALL graftmem.system.rewrite_files('db.spec_rwc_eq', 2000L)")
      .collect()
    val wEq = bwEq.createBatchWriterFactory(null)
      .asInstanceOf[org.apache.spark.sql.connector.write
        .DeltaWriterFactory].createWriter(0, 0L)
    wEq.delete(null, org.apache.spark.sql.catalyst.InternalRow(5L))
    bwEq.commit(Array(wEq.commit())) // composes: no conflict
    assert(spark.table(te).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4L, 6L, 7L, 8L, 9L),
      "the key-addressed delete must kill the MOVED row")
  }

  test("suffix resolution is flavor-checked: __files needs MoR, " +
      "__partitions needs CoW") {
    fresh("spec_files_cow", "(key BIGINT, bal BIGINT)")
    intercept[Exception] {
      spark.table("graftmem.db.spec_files_cow__files").count()
    }
    fresh("spec_parts_mor", "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    intercept[Exception] {
      spark.table("graftmem.db.spec_parts_mor__partitions").count()
    }
  }
}
