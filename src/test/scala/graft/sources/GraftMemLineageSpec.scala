package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** b95 — row lineage: `_row_id` assigned at first commit, preserved
  * through positional AND equality-delete updates, repeated upserts,
  * and compaction; `_last_updated_version` tracks the last updating
  * commit; lineage-derived change counts agree with the snapshot
  * diff.
  */
class GraftMemLineageSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def fresh(name: String, ddl: String): (String, GraftMemMorTable) = {
    catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl $ddl")
    (tbl, catalog().loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemMorTable])
  }

  private def lineageOf(tbl: String): Map[Long, (Long, Long)] =
    spark.sql(s"SELECT key, _row_id, _last_updated_version FROM $tbl")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("positional mode: UPDATE preserves _row_id, bumps " +
      "_last_updated_version; DELETE retires the id") {
    val (tbl, _) = fresh("spec_lin_pos", "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(5).selectExpr("id AS key", "id * 10 AS bal")
      .repartition(1).sortWithinPartitions("key")
      .writeTo(tbl).append() // v1: _row_id = key (sorted single task)
    val l1 = lineageOf(tbl)
    assert(l1 == (0L until 5L).map(k => k -> ((k, 1L))).toMap, l1)
    spark.sql(s"UPDATE $tbl SET bal = 999 WHERE key = 2") // v2
    spark.sql(s"DELETE FROM $tbl WHERE key = 4") // v3
    val l2 = lineageOf(tbl)
    assert(l2(2L) == ((2L, 2L)),
      s"updated row must keep id 2 with luv 2: ${l2(2L)}")
    assert(!l2.contains(4L) && l2(0L) == ((0L, 1L)), l2.toString)
  }

  test("equality mode: repeated upserts of one key keep the ORIGINAL " +
      "id; luv tracks the latest upsert") {
    val (tbl, _) = fresh("spec_lin_eq",
      "(key BIGINT NOT NULL, bal BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'equality')")
    spark.range(4).selectExpr("id AS key", "id AS bal")
      .repartition(1).sortWithinPartitions("key")
      .writeTo(tbl).append() // v1
    (1 to 3).foreach { i => // v2..v4: same key updated thrice
      spark.range(1).selectExpr("CAST(1 AS BIGINT) AS key",
        s"CAST($i AS BIGINT) AS nb").createOrReplaceTempView("sl_b")
      spark.sql(
        s"""MERGE INTO $tbl t USING sl_b b ON t.key = b.key
           |WHEN MATCHED THEN UPDATE SET bal = t.bal + b.nb
           |WHEN NOT MATCHED THEN INSERT (key, bal)
           |  VALUES (b.key, b.nb)""".stripMargin)
    }
    val l = lineageOf(tbl)
    assert(l(1L) == ((1L, 4L)),
      s"thrice-upserted key must keep id 1 with luv 4: ${l(1L)}")
    assert(l(0L) == ((0L, 1L)) && l(3L) == ((3L, 1L)), l.toString)
    // a NOT MATCHED insert mints a fresh id past the landed range
    spark.range(1).selectExpr("CAST(9 AS BIGINT) AS key",
      "CAST(0 AS BIGINT) AS nb").createOrReplaceTempView("sl_b2")
    spark.sql(
      s"""MERGE INTO $tbl t USING sl_b2 b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET bal = b.nb
         |WHEN NOT MATCHED THEN INSERT (key, bal)
         |  VALUES (b.key, b.nb)""".stripMargin)
    val l5 = lineageOf(tbl)
    assert(l5(9L)._1 >= 4L && l5(9L)._2 == 5L, l5(9L).toString)
  }

  test("compaction preserves live identity and prunes dead lineage") {
    val (tbl, table) = fresh("spec_lin_comp",
      "(key BIGINT NOT NULL, bal BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'equality')")
    spark.range(6).selectExpr("id AS key", "id AS bal")
      .repartition(1).sortWithinPartitions("key")
      .writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET bal = 100 WHERE key = 2") // v2
    spark.sql(s"DELETE FROM $tbl WHERE key = 5") // v3
    val before = lineageOf(tbl)
    val sizeBefore = table.synchronized(table.lineage.size)
    spark.sql(s"CALL graftmem.system.compact('db.spec_lin_comp')")
      .collect() // v4
    assert(lineageOf(tbl) == before,
      "compaction must not move any row's (_row_id, luv)")
    assert(table.synchronized(table.lineage.size) < sizeBefore,
      "dead lineage entries must prune at compaction")
    // and a post-compaction update still inherits
    spark.sql(s"UPDATE $tbl SET bal = 200 WHERE key = 2") // v5
    assert(lineageOf(tbl)(2L) == ((2L, 5L)))
  }

  test("the change feed carries commit-time row ids (d33): an " +
      "update's D+I pair shares _row_id, pure inserts mint fresh, " +
      "and the pairing survives compaction pruning the lineage map") {
    val (tbl, _) = fresh("spec_lin_feed",
      "(key BIGINT NOT NULL, bal BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'equality')")
    spark.range(4).selectExpr("id AS key", "id * 10 AS bal")
      .repartition(1).sortWithinPartitions("key")
      .writeTo(tbl).append() // v1: ids 0..3
    spark.sql(s"UPDATE $tbl SET bal = 999 WHERE key = 2") // v2
    spark.sql(s"DELETE FROM $tbl WHERE key = 3") // v3
    // compaction prunes key 3's lineage entry — its FEED row must
    // still carry the id it had (stored at commit, not derived)
    spark.sql(s"CALL graftmem.system.compact('db.spec_lin_feed')")
    val ch = spark.sql(
      s"""SELECT _commit_version, _change_type, _row_id, key
         |FROM ${tbl}__changes ORDER BY _commit_version, _pos""".stripMargin)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // v1: four inserts with fresh ids 0..3 (sorted single task)
    assert(ch.filter(_._1 == 1L).map(e => (e._2, e._3)).toSeq ==
      Seq(("insert", 0L), ("insert", 1L), ("insert", 2L), ("insert", 3L)))
    // v2: key 2's update = a D+I pair SHARING id 2
    val v2 = ch.filter(_._1 == 2L)
    assert(v2.map(e => (e._2, e._3, e._4)).toSet ==
      Set(("delete", 2L, 2L), ("insert", 2L, 2L)), v2.mkString(";"))
    // v3: key 3's pure delete keeps its id, no paired insert
    assert(ch.filter(_._1 == 3L).map(e => (e._2, e._3, e._4)).toSeq ==
      Seq(("delete", 3L, 3L)))
    // compaction (v4) contributes nothing to the feed
    assert(!ch.exists(_._1 == 4L))
  }

  test("changed-row count by lineage == snapshot diff (the b84 " +
      "cross-check)") {
    val (tbl, _) = fresh("spec_lin_diff",
      "(key BIGINT NOT NULL, bal BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'equality')")
    spark.range(50).selectExpr("id AS key", "id * 10 AS bal")
      .repartition(1).sortWithinPartitions("key")
      .writeTo(tbl).append() // v1
    spark.range(50).filter("id % 5 = 2")
      .selectExpr("id AS key", "CAST(7777 AS BIGINT) AS nb")
      .createOrReplaceTempView("sl_diff_b")
    spark.sql(
      s"""MERGE INTO $tbl t USING sl_diff_b b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET bal = b.nb""".stripMargin) // v2
    // lineage view: rows updated since v1
    val byLineage = spark.sql(
      s"SELECT count(*) FROM $tbl WHERE _last_updated_version > 1")
      .collect()(0).getLong(0)
    // snapshot-diff view: value changed between VERSION 1 and now
    val byDiff = spark.sql(
      s"""SELECT count(*) FROM $tbl cur
         |JOIN (SELECT key, bal FROM $tbl VERSION AS OF 1) old
         |ON cur.key = old.key WHERE cur.bal <> old.bal""".stripMargin)
      .collect()(0).getLong(0)
    assert(byLineage == byDiff && byLineage == 10L,
      s"lineage=$byLineage diff=$byDiff")
  }
}
