package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** b92 — snapshot branches + write-audit-publish: a branch forks main
  * by reference, staged writes land on the branch only (main untouched
  * by object identity AND version), the parent's CHECK constraints
  * audit every branch write at the engine level, and fast_forward
  * publishes atomically iff main is unchanged since the fork.
  */
class GraftMemBranchSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def fresh(name: String, ddl: String): (String, GraftMemTable) = {
    val cat = catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl $ddl")
    (tbl, cat.loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemTable])
  }

  test("branch writes leave main untouched (object identity + version); " +
      "publish swaps main atomically and consumes the branch") {
    val (tbl, table) = fresh("spec_wap", "(key BIGINT, bal BIGINT)")
    spark.range(5).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // v1
    val res = spark.sql(
      s"CALL graftmem.system.create_branch('db.spec_wap', 'b')").collect()
    assert(res(0).getString(0) == "b" && res(0).getLong(1) == 1L)
    val mainRowsBefore = table.rows
    val vBefore = table.synchronized(table.commitVersion)
    // stage on the branch
    spark.range(100, 103).selectExpr("id AS key", "id AS bal")
      .writeTo(s"${tbl}__branch_b").append()
    // the branch sees fork content + staged rows; main sees neither
    assert(spark.table(s"${tbl}__branch_b").count() == 8)
    assert(spark.table(tbl).count() == 5)
    assert(table.rows eq mainRowsBefore,
      "a branch write must never touch main's row vector")
    assert(table.synchronized(table.commitVersion) == vBefore,
      "a branch write must never bump main's version")
    // publish
    val ff = spark.sql(
      s"CALL graftmem.system.fast_forward('db.spec_wap', 'main', 'b')")
      .collect()
    assert(ff(0).getLong(0) == 8L, s"published_rows: ${ff(0)}")
    assert(ff(0).getLong(1) == 1L, s"branch_commits: ${ff(0)}")
    assert(spark.table(tbl).count() == 8)
    // the branch is consumed; pre-publish main stays time-travelable
    val e = intercept[Exception] {
      spark.table(s"${tbl}__branch_b").count()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    val v1 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").count()
    assert(v1 == 5L, "pre-publish history must survive the publish")
  }

  test("the parent's CHECK constraint gates branch writes; a failed " +
      "audit write leaves branch AND main clean") {
    val (tbl, table) = fresh("spec_wap_ck",
      "(key BIGINT, bal BIGINT, CONSTRAINT box CHECK (bal < 1000))")
    spark.range(3).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    spark.sql(s"CALL graftmem.system.create_branch('db.spec_wap_ck', 'b')")
      .collect()
    val err = intercept[Exception] {
      spark.range(1).selectExpr("id AS key", "CAST(5000 AS BIGINT) AS bal")
        .writeTo(s"${tbl}__branch_b").append()
    }
    assert(err.getMessage.toUpperCase.contains("CHECK") ||
      err.getMessage.contains("box"), err.getMessage)
    assert(spark.table(s"${tbl}__branch_b").count() == 3,
      "rejected write must leave the branch unchanged")
    assert(spark.table(tbl).count() == 3)
    assert(table.synchronized(table.commitVersion) == 1L,
      "main's history must stay clean across a failed audit")
  }

  test("fast_forward rejects a diverged main loudly and changes nothing") {
    val (tbl, table) = fresh("spec_wap_div", "(key BIGINT, bal BIGINT)")
    spark.range(4).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    spark.sql(s"CALL graftmem.system.create_branch('db.spec_wap_div', 'b')")
      .collect()
    spark.range(50, 52).selectExpr("id AS key", "id AS bal")
      .writeTo(s"${tbl}__branch_b").append()
    // main moves AFTER the fork — the precondition breaks
    spark.range(99, 100).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append()
    val before = spark.table(tbl).orderBy("key").collect().toSeq
    val err = intercept[GraftMemCommitConflictException] {
      spark.sql(
        s"CALL graftmem.system.fast_forward('db.spec_wap_div', 'main', 'b')")
        .collect()
    }
    assert(err.getMessage.contains("fast-forward"), err.getMessage)
    assert(spark.table(tbl).orderBy("key").collect().toSeq == before)
    // the branch survives the failed publish for re-staging inspection
    assert(table.synchronized(table.branches.contains("b")))
  }

  test("a branch write whose commit lands AFTER the branch was " +
      "published rejects loudly (no silent append to the orphaned fork)") {
    val (tbl, table) = fresh("spec_wap_stale", "(key BIGINT, bal BIGINT)")
    spark.range(3).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    spark.sql(
      s"CALL graftmem.system.create_branch('db.spec_wap_stale', 'b')")
      .collect()
    val br = table.synchronized(table.branches("b"))
    val bt = new GraftMemBranchTable(table, br)
    // build the write BEFORE the publish (the in-flight writer), then
    // let fast_forward consume the branch under it
    val winfo = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "spec-stale"
      override def schema(): org.apache.spark.sql.types.StructType =
        table.schema()
      override def options()
          : org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }
    val bw = bt.newWriteBuilder(winfo).build().toBatch
    spark.sql(
      s"CALL graftmem.system.fast_forward('db.spec_wap_stale', 'main', 'b')")
      .collect()
    val rowsBefore = br.rows
    val err = intercept[GraftMemCommitConflictException] {
      bw.commit(Array(GraftMemCommit(Vector(Array[Any](
        java.lang.Long.valueOf(9L), java.lang.Long.valueOf(9L))))))
    }
    assert(err.getMessage.contains("published or dropped"), err.getMessage)
    assert(br.rows eq rowsBefore,
      "a rejected stale commit must not touch the orphaned branch either")
    // same rejection when a SAME-NAMED branch was re-forked meanwhile
    // (`eq` check: the new fork is a different object)
    spark.sql(
      s"CALL graftmem.system.create_branch('db.spec_wap_stale', 'b')")
      .collect()
    val err2 = intercept[GraftMemCommitConflictException] {
      bw.commit(Array(GraftMemCommit(Vector(Array[Any](
        java.lang.Long.valueOf(9L), java.lang.Long.valueOf(9L))))))
    }
    assert(err2.getMessage.contains("published or dropped"), err2.getMessage)
    assert(spark.table(s"${tbl}__branch_b").count() == 3,
      "the re-forked branch must not receive the stale writer's rows")
  }

  test("drop_branch abandons staging without publishing (the " +
      "failed-audit exit): main untouched, name reusable") {
    val (tbl, table) = fresh("spec_wap_drop", "(key BIGINT, bal BIGINT)")
    spark.range(3).selectExpr("id AS key", "id AS bal").writeTo(tbl).append()
    spark.sql(
      s"CALL graftmem.system.create_branch('db.spec_wap_drop', 'b')")
      .collect()
    spark.range(10, 12).selectExpr("id AS key", "id AS bal")
      .writeTo(s"${tbl}__branch_b").append()
    val vBefore = table.synchronized(table.commitVersion)
    val res = spark.sql(
      s"CALL graftmem.system.drop_branch('db.spec_wap_drop', 'b')")
      .collect()
    assert(res(0).getString(0) == "b" && res(0).getLong(1) == 1L, res(0))
    assert(spark.table(tbl).count() == 3)
    assert(table.synchronized(table.commitVersion) == vBefore,
      "dropping a branch must not commit anything to main")
    assert(!table.synchronized(table.branches.contains("b")))
    // the name is free again (per-batch staging reuses the pattern)
    spark.sql(
      s"CALL graftmem.system.create_branch('db.spec_wap_drop', 'b')")
      .collect()
    val e = intercept[Exception] {
      spark.sql(
        s"CALL graftmem.system.drop_branch('db.spec_wap_drop', 'x')")
        .collect()
    }
    assert(e.getMessage.contains("no branch"), e.getMessage)
  }

  test("procedure validation: duplicate branch, unknown branch, " +
      "non-main target, MoR parent all reject loudly") {
    val (tbl, _) = fresh("spec_wap_val", "(key BIGINT, bal BIGINT)")
    spark.sql(s"CALL graftmem.system.create_branch('db.spec_wap_val', 'b')")
      .collect()
    val e1 = intercept[Exception] {
      spark.sql(s"CALL graftmem.system.create_branch('db.spec_wap_val', 'b')")
        .collect()
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        s"CALL graftmem.system.fast_forward('db.spec_wap_val', 'main', 'x')")
        .collect()
    }
    assert(e2.getMessage.contains("no branch"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(
        s"CALL graftmem.system.fast_forward('db.spec_wap_val', 'b2', 'b')")
        .collect()
    }
    assert(e3.getMessage.contains("main"), e3.getMessage)
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_wap_mor")
    spark.sql("CREATE TABLE graftmem.db.spec_wap_mor (key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    val e4 = intercept[Exception] {
      spark.sql(s"CALL graftmem.system.create_branch('db.spec_wap_mor', 'b')")
        .collect()
    }
    assert(e4.getMessage.contains("merge-on-read"), e4.getMessage)
    // invalid branch grammar
    val e5 = intercept[Exception] {
      spark.sql(
        s"CALL graftmem.system.create_branch('db.spec_wap_val', 'a b')")
        .collect()
    }
    assert(e5.getMessage.contains("branch names"), e5.getMessage)
  }
}
