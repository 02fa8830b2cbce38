package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** b91 — EQUALITY DELETES on the merge-on-read flavor
  * (`graft.mor.deletes = 'equality'`): the delta writer addresses rows
  * BY KEY (rowId = the key data column), each committed delete is
  * scoped by a position boundary (the sequence-number rule), and the
  * commit validates conflicting deletes against the operation's
  * pinned scan version. The positional flavor's contracts
  * (base-object identity, no-trace rejection, compaction invariance,
  * change-feed preimages) all carry over and are re-proven here on
  * the equality path.
  */
class GraftMemEqDeleteSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def freshEq(name: String): (String, GraftMemMorTable) = {
    val cat = catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT NOT NULL, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
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

  test("equality MERGE plans WriteDelta addressed by key — no _pos in " +
      "the plan, base rows keep object identity, the update's " +
      "re-insert survives its own commit's delete") {
    val (tbl, table) = freshEq("spec_eq_merge")
    spark.range(10).selectExpr("id AS key", "id * 100 AS bal")
      .writeTo(tbl).append()
    val baseBefore = table.base
    spark.range(5, 15).selectExpr("id AS key", "id * 1000 AS nb")
      .createOrReplaceTempView("spec_eq_batch")
    val m = spark.sql(
      s"""MERGE INTO $tbl t USING spec_eq_batch b ON t.key = b.key
         |WHEN MATCHED AND b.key % 2 = 0 THEN UPDATE SET bal = b.nb
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (key, bal) VALUES (b.key, b.nb)
         |""".stripMargin)
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("WriteDelta"),
      s"equality MERGE must plan WriteDelta, got:\n$plan")
    // the b91 point: deletes are key-addressed, so the plan never
    // projects the positional row id at all
    assert(!plan.contains("_pos"),
      s"equality-delete plan must not reference _pos:\n$plan")
    assert(table.base eq baseBefore, "MERGE rewrote the base vector")
    assert(table.deleted.isEmpty,
      "equality mode must not produce positional tombstones")
    // updates (6, 8) + deletes (5, 7, 9) = 5 equality deletes, one
    // shared boundary, all scoped to kill only pre-commit rows
    assert(table.eqDeletes.map(_._1).sorted == Vector(5L, 6L, 7L, 8L, 9L),
      s"eqDeletes: ${table.eqDeletes}")
    assert(table.eqDeletes.map(_._2).distinct == Vector(10L),
      "boundary must be the pre-commit next-position (10 base rows)")
    // re-inserted updates have pos >= boundary and so survive the
    // delete of their own key — the sequence-number scoping
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect =
      (0L to 4L).map(k => (k, k * 100)) ++
        Seq((6L, 6000L), (8L, 8000L)) ++
        (10L to 14L).map(k => (k, k * 1000))
    assert(got == expect)
  }

  test("repeated upserts of ONE key across sequential commits stack — " +
      "the d25 streaming-CDC shape equality deletes exist for") {
    val (tbl, table) = freshEq("spec_eq_upsert")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 10)")
    (1 to 3).foreach { i =>
      spark.sql(s"UPDATE $tbl SET bal = bal + 100 WHERE key = 1")
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 10L + 100L * i)), s"round $i: $got")
    }
    // three deletes of the same key, each with a LATER boundary — the
    // max-boundary rule keeps exactly the newest row alive
    assert(table.eqDeletes.count(_._1 == 1L) == 3)
    assert(table.eqDeletes.map(_._2) == table.eqDeletes.map(_._2).sorted)
  }

  test("commit conflict: same key deleted by a commit after this " +
      "operation's scan → loud rejection, no trace; disjoint keys land") {
    val (tbl, table) = freshEq("spec_eq_conflict")
    spark.range(8).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    def deltaDelete(keys: Seq[Long]) = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.DELETE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().asInstanceOf[
          org.apache.spark.sql.connector.write.SupportsDelta]
      assert(op.rowId().map(_.fieldNames().mkString(".")).toSeq ==
        Seq("key"), "equality mode's rowId must be the key column")
      op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()
      val bw = op.newWriteBuilder(writeInfo(table)).build().toBatch
      val w = bw.createBatchWriterFactory(null)
        .asInstanceOf[org.apache.spark.sql.connector.write
          .DeltaWriterFactory].createWriter(0, 0L)
      keys.foreach { k =>
        w.delete(null, org.apache.spark.sql.catalyst.InternalRow(k))
      }
      (bw, Array(w.commit()))
    }
    // all three scan the SAME snapshot, then commit in turn
    val (bw1, m1) = deltaDelete(Seq(2L, 3L))
    val (bw2, m2) = deltaDelete(Seq(3L, 4L)) // overlaps on key 3
    val (bw3, m3) = deltaDelete(Seq(6L))     // disjoint
    bw1.commit(m1)
    val logBefore = table.changeLog.length
    val err = intercept[GraftMemCommitConflictException] { bw2.commit(m2) }
    assert(err.getMessage.contains("3"))
    assert(table.changeLog.length == logBefore,
      "rejected commit must leave no change-log trace")
    bw3.commit(m3)
    val keys = spark.table(tbl).collect().map(_.getLong(0)).sorted.toSeq
    assert(keys == Seq(0L, 1L, 4L, 5L, 7L), s"post-commit content: $keys")
  }

  test("conflict also fires when the concurrent commit UPDATED the key " +
      "(delete + live re-insert — the vanished check alone would miss " +
      "the lost update)") {
    val (tbl, table) = freshEq("spec_eq_lostupd")
    spark.range(4).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
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
      .build().toBatch.planInputPartitions() // pins the scan version
    // concurrent UPDATE of key 1: key 1 is deleted AND re-inserted, so
    // it is still live — only the version check can catch the stale op
    spark.sql(s"UPDATE $tbl SET bal = bal + 100 WHERE key = 1")
    val bw = op.newWriteBuilder(writeInfo(table)).build().toBatch
    val w = bw.createBatchWriterFactory(null)
      .asInstanceOf[org.apache.spark.sql.connector.write
        .DeltaWriterFactory].createWriter(0, 0L)
    w.delete(null, org.apache.spark.sql.catalyst.InternalRow(1L))
    val err = intercept[GraftMemCommitConflictException] {
      bw.commit(Array(w.commit()))
    }
    assert(err.getMessage.contains("equality-deleted"), err.getMessage)
    // the concurrent update survived untouched
    val bal1 = spark.table(tbl).where("key = 1").collect()
      .map(_.getLong(1)).toSeq
    assert(bal1 == Seq(101L))
  }

  test("compaction folds equality deletes, content-invariant; the " +
      "table stays operational and time travel keeps pre-compaction " +
      "versions") {
    val (tbl, table) = freshEq("spec_eq_cpct")
    spark.range(6).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append()                                   // v1
    spark.sql(s"DELETE FROM $tbl WHERE key % 2 = 1")           // v2
    spark.sql(s"UPDATE $tbl SET bal = bal + 7 WHERE key = 4")  // v3
    val before = spark.table(tbl).orderBy("key").collect().toSeq
    val res = spark.sql(
      s"CALL graftmem.system.compact('db.spec_eq_cpct')").collect() // v4
    assert(res(0).getLong(2) == 3L, s"live_rows: ${res(0)}")
    assert(table.eqDeletes.isEmpty && table.deltaInserts.isEmpty)
    assert(spark.table(tbl).orderBy("key").collect().toSeq == before)
    // historical read through the equality-delete snapshot shape
    val v2 = spark.sql(s"SELECT key, bal FROM $tbl VERSION AS OF 2")
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v2 == Seq((0L, 0L), (2L, 20L), (4L, 40L)))
    // still row-level operational after compaction
    spark.sql(s"UPDATE $tbl SET bal = bal + 1 WHERE key = 0")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (2L, 20L), (4L, 47L)))
  }

  test("change feed: equality delete logs the victim's preimage; " +
      "update = D+I — identical feed semantics to the positional mode") {
    val (tbl, _) = freshEq("spec_eq_cdc")
    spark.range(3).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append()                                    // v1
    spark.sql(s"DELETE FROM $tbl WHERE key = 1")                // v2
    spark.sql(s"UPDATE $tbl SET bal = bal + 5 WHERE key = 2")   // v3
    val ch = spark.table(s"${tbl}__changes")
      .where("_commit_version >= 2")
      .select("_commit_version", "_change_type", "key", "bal")
      .orderBy("_commit_version", "_change_type", "key")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(ch == Seq(
      (2L, "delete", 1L, 10L),
      (3L, "delete", 2L, 20L), (3L, "insert", 2L, 25L)),
      s"feed:\n${ch.mkString("\n")}")
  }

  test("d31: the streaming equality upsert equals the positional d25 " +
      "AND the batch aggregate, with zero positional tombstones in " +
      "the table it builds") {
    val a = graft.SparkEntry.queries("d31_stream_eq_upsert")(spark, sf0001)
      .collect().toSeq
    val b = graft.SparkEntry.queries("d25_stream_mor_upsert")(spark, sf0001)
      .collect().toSeq
    assert(a == b && a.nonEmpty,
      "equality and positional streaming upserts diverged")
    // the table d31 built: key-addressed deltas only — no positional
    // tombstones anywhere, multiple boundary generations from the
    // per-batch merges
    val suf = java.security.MessageDigest.getInstance("MD5")
      .digest(sf0001.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    val t = GraftMemCatalog.lookup(s"db.morup31_$suf")
      .asInstanceOf[GraftMemMorTable]
    assert(t.isEquality)
    assert(t.deleted.isEmpty,
      "equality mode must never write positional tombstones")
    assert(t.eqDeletes.nonEmpty,
      "per-batch MERGEs must have landed key-addressed deletes")
  }

  test("creation validation: nullable key and unknown modes reject " +
      "loudly; b91's declared query equals b75/b80's") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_eq_bad")
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graftmem.db.spec_eq_bad " +
        "(key BIGINT, bal BIGINT) " + // nullable key
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'equality')")
    }
    assert(e1.getMessage.contains("NOT NULL"), e1.getMessage)
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_eq_bad")
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graftmem.db.spec_eq_bad " +
        "(key BIGINT NOT NULL, bal BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'fancy')")
    }
    assert(e2.getMessage.contains("graft.mor.deletes"), e2.getMessage)
    val a = graft.SparkEntry.queries("b91_equality_delete")(spark, sf0001)
      .collect().toSeq
    val b = graft.SparkEntry.queries("b75_merge_into")(spark, sf0001)
      .collect().toSeq
    assert(a == b && a.nonEmpty,
      "equality-delete MERGE produced different post-merge state")
  }
}
