package graft.sources

import graft.SparkSpec

/** Partition-management (`SupportsAtomicPartitionManagement`, b88) and
  * namespace (`SupportsNamespaces`) faces of the graftmem catalog: the
  * DDL a real catalog governs around its tables.
  */
class GraftMemPartitionSpec extends SparkSpec {

  private def freshPartitioned(name: String): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, bal BIGINT) " +
      "PARTITIONED BY (g)")
    spark.range(40).selectExpr("id AS key", "id % 4 AS g", "id * 10 AS bal")
      .writeTo(tbl).append()
    tbl
  }

  private def listedParts(tbl: String): Seq[Long] =
    spark.sql(s"SHOW PARTITIONS $tbl").collect()
      .map(_.getString(0).split('=')(1).toLong).toSeq.sorted

  test("b97 metadata-only DELETE: a partition-only predicate plans " +
      "DeleteFromTableExec (no rewrite); a data-column predicate keeps " +
      "ReplaceData; the drop is versioned and time-travelable") {
    val tbl = freshPartitioned("spec_mdel")
    val p1 = spark.sql(s"DELETE FROM $tbl WHERE g IN (1, 3)")
      .queryExecution.executedPlan.toString
    assert(p1.contains("DeleteFromTable"),
      s"partition-only DELETE must plan metadata-only:\n$p1")
    assert(!p1.contains("ReplaceData"),
      s"metadata delete must not rewrite:\n$p1")
    assert(spark.table(tbl).count() == 20L)
    assert(spark.sql(s"SELECT DISTINCT g FROM $tbl ORDER BY g")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 2L))
    // the drop is a COMMIT: version bumped, pre-drop data reachable
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 40L)
    // a data-column predicate declines → copy-on-write rewrite
    val p2 = spark.sql(s"DELETE FROM $tbl WHERE bal >= 200")
      .queryExecution.executedPlan.toString
    assert(p2.contains("ReplaceData"),
      s"data-column DELETE must keep the row-level rewrite:\n$p2")
    assert(!p2.contains("DeleteFromTableExec"), p2)
    assert(spark.table(tbl).count() ==
      (0L until 40L).count(i => (i % 4 == 0 || i % 4 == 2) && i * 10 < 200))
    // an unpartitioned table has no metadata-delete grain at all
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_mdel_flat")
    spark.sql("CREATE TABLE graftmem.db.spec_mdel_flat " +
      "(key BIGINT, bal BIGINT)")
    spark.range(5).selectExpr("id AS key", "id AS bal")
      .writeTo("graftmem.db.spec_mdel_flat").append()
    val p3 = spark.sql(
      "DELETE FROM graftmem.db.spec_mdel_flat WHERE key = 1")
      .queryExecution.executedPlan.toString
    assert(p3.contains("ReplaceData"), p3)
    assert(spark.table("graftmem.db.spec_mdel_flat").count() == 4L)
  }

  test("SHOW PARTITIONS lists data-implied partitions; ADD declares an " +
      "empty one; DROP removes declaration AND data; TRUNCATE empties " +
      "but keeps the partition listed") {
    val tbl = freshPartitioned("spec_pm")
    assert(listedParts(tbl) == Seq(0L, 1L, 2L, 3L))

    spark.sql(s"ALTER TABLE $tbl ADD PARTITION (g = 9)")
    assert(listedParts(tbl) == Seq(0L, 1L, 2L, 3L, 9L))
    assert(spark.table(tbl).where("g = 9").count() == 0)

    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 2)")
    assert(listedParts(tbl) == Seq(0L, 1L, 3L, 9L))
    assert(spark.table(tbl).where("g = 2").count() == 0)

    spark.sql(s"TRUNCATE TABLE $tbl PARTITION (g = 3)")
    assert(listedParts(tbl) == Seq(0L, 1L, 3L, 9L),
      "a truncated partition must stay listed (emptied, not dropped)")
    assert(spark.table(tbl).where("g = 3").count() == 0)
    assert(spark.table(tbl).count() == 20, "groups 0 and 1 survive")

    // filtered listing
    assert(spark.sql(s"SHOW PARTITIONS $tbl PARTITION (g = 9)")
      .count() == 1)
    assert(spark.sql(s"SHOW PARTITIONS $tbl PARTITION (g = 2)")
      .count() == 0)
  }

  test("partition DDL failure modes: duplicate ADD, missing TRUNCATE, " +
      "missing DROP without IF EXISTS; IF EXISTS/IF NOT EXISTS absorb") {
    val tbl = freshPartitioned("spec_pmerr")
    intercept[org.apache.spark.sql.catalyst.analysis
      .PartitionsAlreadyExistException] {
      spark.sql(s"ALTER TABLE $tbl ADD PARTITION (g = 1)")
    }
    spark.sql(s"ALTER TABLE $tbl ADD IF NOT EXISTS PARTITION (g = 1)")
    intercept[Exception] {
      spark.sql(s"TRUNCATE TABLE $tbl PARTITION (g = 77)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 77)")
    }
    spark.sql(s"ALTER TABLE $tbl DROP IF EXISTS PARTITION (g = 77)")
    // multi-partition DDL is atomic: one missing partition fails the
    // whole statement and deletes nothing
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 1), PARTITION (g = 77)")
    }
    assert(spark.table(tbl).where("g = 1").count() == 10,
      "a failed multi-partition DROP must leave every partition intact")
  }

  test("DROP PARTITION is a versioned commit: time travel still reads " +
      "the dropped data, and the group's version bump is visible") {
    val tbl = freshPartitioned("spec_pmtt")
    val preDrop = spark.table(tbl).count()
    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 0)")
    assert(spark.table(tbl).count() == preDrop - 10)
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").count()
      == preDrop, "the pre-drop snapshot keeps the dropped partition")
  }

  test("partition DDL participates in optimistic concurrency: a " +
      "group-narrowed row-level op commits past a DISJOINT drop and " +
      "conflicts on an OVERLAPPING one") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val tbl = freshPartitioned("spec_pmocc")
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_pmocc"))
      .asInstanceOf[GraftMemTable]
    // one full row-level round, narrowed to group `g`, with `ddl`
    // interleaved between the scan (which pins the snapshot) and the
    // commit — the write replaces group g's rows with bal+1
    def roundWithInterleaved(g: Long)(ddl: => Unit): Unit = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.UPDATE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build()
      val scan = op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
      scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]
        .filter(Array(new Predicate("IN",
          Array(Expressions.column("_group"),
            Expressions.literal(g)))))
      scan.toBatch.planInputPartitions()
      val rewritten = spark.sql(
        s"SELECT key, g, bal + 1 FROM $tbl WHERE g = $g").collect()
      ddl
      val bw = op.newWriteBuilder(
        new org.apache.spark.sql.connector.write.LogicalWriteInfo {
          override def queryId(): String = "spec_pmocc"
          override def schema() = table.schema()
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().toBatch
      val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
      rewritten.foreach(r => w.write(org.apache.spark.sql.catalyst
        .InternalRow(r.getLong(0), r.getLong(1), r.getLong(2))))
      bw.commit(Array(w.commit()))
    }
    // disjoint: rewrite group 1 while partition 3 is dropped — lands
    roundWithInterleaved(1L) {
      spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 3)")
    }
    assert(spark.sql(s"SELECT sum(bal) FROM $tbl WHERE g = 1")
      .head().getLong(0) == (1L to 37L by 4).map(_ * 10 + 1).sum)
    // overlapping: partition 1 dropped under the op's feet — conflicts
    intercept[GraftMemCommitConflictException] {
      roundWithInterleaved(1L) {
        spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 1)")
      }
    }
  }

  test("no-op partition DDL is metadata-only: truncating or dropping " +
      "a declared-empty partition bumps no version") {
    val tbl = freshPartitioned("spec_pmnoop")
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_pmnoop"))
      .asInstanceOf[GraftMemTable]
    spark.sql(s"ALTER TABLE $tbl ADD PARTITION (g = 9)")
    val v0 = table.synchronized(table.commitVersion)
    spark.sql(s"TRUNCATE TABLE $tbl PARTITION (g = 9)") // no data
    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 9)") // still none
    assert(table.synchronized(table.commitVersion) == v0,
      "declared-only partition DDL must not version-stamp its group")
    // dropping a DATA-holding partition is a real commit
    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (g = 1)")
    assert(table.synchronized(table.commitVersion) == v0 + 1)
  }

  test("unpartitioned tables reject partition DDL loudly") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_pmflat")
    spark.sql(
      "CREATE TABLE graftmem.db.spec_pmflat (key BIGINT, bal BIGINT)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graftmem.db.spec_pmflat " +
        "ADD PARTITION (key = 1)")
    }
    assert(e.getMessage != null)
  }

  test("namespaces: CREATE/SHOW/DESCRIBE/ALTER/DROP; non-empty needs " +
      "CASCADE; data-implied namespaces exist") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP NAMESPACE IF EXISTS graftmem.spec_ns CASCADE")
    spark.sql("CREATE NAMESPACE graftmem.spec_ns " +
      "COMMENT 'spec namespace'")
    intercept[org.apache.spark.sql.catalyst.analysis
      .NamespaceAlreadyExistsException] {
      spark.sql("CREATE NAMESPACE graftmem.spec_ns")
    }
    val shown = spark.sql("SHOW NAMESPACES IN graftmem").collect()
      .map(_.getString(0)).toSet
    assert(shown.contains("spec_ns"))
    assert(shown.contains("db"), "the seeded demo namespace is listed")
    val desc = spark.sql("DESCRIBE NAMESPACE graftmem.spec_ns").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Comment").contains("spec namespace"))
    spark.sql("ALTER NAMESPACE graftmem.spec_ns " +
      "SET PROPERTIES ('owner_team' = 'graft')")
    val desc2 = spark.sql(
      "DESCRIBE NAMESPACE EXTENDED graftmem.spec_ns").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc2("Properties").contains("owner_team"))

    // non-empty namespace refuses a bare DROP, CASCADE drops the lot
    spark.sql(
      "CREATE TABLE graftmem.spec_ns.t1 (key BIGINT, bal BIGINT)")
    // the engine surfaces the connector's NonEmptyNamespaceException
    // as the standard SCHEMA_NOT_EMPTY analysis error
    val ne = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP NAMESPACE graftmem.spec_ns")
    }
    assert(ne.getCondition == "SCHEMA_NOT_EMPTY",
      s"got ${ne.getCondition}: ${ne.getMessage}")
    spark.sql("DROP NAMESPACE graftmem.spec_ns CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graftmem").collect()
      .map(_.getString(0)).contains("spec_ns"))
    intercept[Exception] {
      spark.table("graftmem.spec_ns.t1").count()
    }

    // a namespace that exists only through its tables is still real
    spark.sql(
      "CREATE TABLE graftmem.spec_ns2.t2 (key BIGINT, bal BIGINT)")
    assert(spark.sql("SHOW NAMESPACES IN graftmem").collect()
      .map(_.getString(0)).contains("spec_ns2"))
    spark.sql("SHOW TABLES IN graftmem.spec_ns2").collect()
    spark.sql("DROP NAMESPACE graftmem.spec_ns2 CASCADE")
  }
}
