package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** Time travel (b84) over both graftmem flavors: `VERSION AS OF` /
  * `TIMESTAMP AS OF` resolve through the catalog's timestamped
  * loadTable overloads, snapshots are immutable against later
  * commits, MoR compaction is a content-invariant version, and
  * `expire_snapshots` bounds history loudly.
  */
class GraftMemTimeTravelSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def fresh(name: String, props: String = ""): String = {
    catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT)$props")
    tbl
  }

  test("b93: the __history metadata table tracks both flavors — " +
      "compaction is a count-invariant version, expiry prunes " +
      "untagged rows, tags and the current marker surface") {
    // MoR: append → delete → update → compact
    val tbl = fresh("spec_hist_mor",
      " TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(6).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append()                             // v1: 6 rows
    spark.sql(s"DELETE FROM $tbl WHERE key % 3 = 0")     // v2: 4 rows
    spark.sql(s"UPDATE $tbl SET bal = bal + 1 WHERE key = 1") // v3: 4
    spark.sql("CALL graftmem.system.compact('db.spec_hist_mor')")
      .collect()                                         // v4: 4 rows
    def hist() = spark.table(s"${tbl}__history")
      .select("version", "live_rows", "n_tags", "is_current")
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .toSeq
    assert(hist() == Seq((0L, 0L, 0, false), (1L, 6L, 0, false),
      (2L, 4L, 0, false), (3L, 4L, 0, false), (4L, 4L, 0, true)),
      s"history:\n${hist()}")
    // a tag pins its version through expiry; untagged history prunes
    spark.sql("CALL graftmem.system.create_tag(" +
      "'db.spec_hist_mor', 'keep1', 1L)").collect()
    spark.sql("CALL graftmem.system.expire_snapshots(" +
      "'db.spec_hist_mor', 1)").collect()
    assert(hist() == Seq((1L, 6L, 1, false), (4L, 4L, 0, true)),
      s"post-expiry history:\n${hist()}")
    // the suffix resolves only over history-keeping parents
    val e = intercept[Exception] {
      spark.table("graftmem.db.nope__history").count()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("CoW: VERSION AS OF reads each committed snapshot; snapshots " +
      "are immutable against later commits") {
    val tbl = fresh("spec_tt_cow")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE key >= 5") // v2 (row-level)
    spark.range(100, 103).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v3
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 0").count() == 0)
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").count() == 10)
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2").count() == 5)
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 3").count() == 8)
    assert(spark.table(tbl).count() == 8)
    // a later UPDATE must not leak into the v1 snapshot
    spark.sql(s"UPDATE $tbl SET bal = bal + 1000 WHERE key < 5") // v4
    val v1 = spark.sql(
      s"SELECT CAST(sum(bal) AS BIGINT) AS s FROM $tbl VERSION AS OF 1")
      .head().getLong(0)
    assert(v1 == (0 until 10).sum,
      s"v1 snapshot changed after a later UPDATE: sum=$v1")
    // column pruning reaches the snapshot scan
    val pruned = spark.sql(s"SELECT key FROM $tbl VERSION AS OF 1")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("GraftMemSnapshotScan"))
    assert(pruned.count() == 10)
  }

  test("CoW: TIMESTAMP AS OF resolves to the latest snapshot at or " +
      "before the timestamp") {
    val tbl = fresh("spec_tt_ts")
    val cat = catalog()
    val ident = Identifier.of(Array("db"), "spec_tt_ts")
    spark.range(4).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    Thread.sleep(2)
    val betweenMicros = System.currentTimeMillis() * 1000L
    Thread.sleep(2)
    spark.range(10, 16).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v2
    // between v1 and v2 → v1
    val t1 = cat.loadTable(ident, betweenMicros)
    assert(t1.name().endsWith("VERSION AS OF 1"), t1.name())
    // far future → latest
    val t2 = cat.loadTable(ident, betweenMicros + 3600L * 1000000L)
    assert(t2.name().endsWith("VERSION AS OF 2"), t2.name())
    // before the table existed → loud error
    val err = intercept[IllegalArgumentException] {
      cat.loadTable(ident, 1000L)
    }
    assert(err.getMessage.contains("no snapshot committed at or before"))
    // the SQL face: TIMESTAMP AS OF with a foldable expression
    val n = spark.sql(s"SELECT count(*) AS n FROM $tbl TIMESTAMP AS OF " +
      s"timestamp_micros(${betweenMicros}L)").head().getLong(0)
    assert(n == 4, s"TIMESTAMP AS OF between commits read $n rows")
  }

  test("MoR: snapshots span delta commits, and compaction is a " +
      "content-invariant version") {
    val tbl = fresh("spec_tt_mor",
      " TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(10).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE key % 3 = 0") // v2 (tombstones)
    spark.sql(s"CALL graftmem.system.compact('db.spec_tt_mor')")
      .collect() // v3 — maintenance
    spark.sql(s"UPDATE $tbl SET bal = bal + 1 WHERE key = 1") // v4
    def rows(v: Long) = spark.sql(
      s"SELECT key, bal FROM $tbl VERSION AS OF $v ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(0).isEmpty)
    assert(rows(1) == (0L until 10L).map(k => (k, k * 10)))
    val postDelete = (0L until 10L).filter(_ % 3 != 0).map(k => (k, k * 10))
    assert(rows(2) == postDelete)
    assert(rows(3) == postDelete,
      "compaction changed the visible content of its snapshot")
    assert(rows(4) == postDelete.map {
      case (1L, b) => (1L, b + 1); case kv => kv
    })
  }

  test("expire_snapshots keeps the most recent keep_last versions and " +
      "reading an expired one fails loudly with the retained range") {
    val tbl = fresh("spec_tt_exp")
    (1 to 4).foreach { i =>
      spark.range(i).selectExpr("id AS key", "id AS bal")
        .writeTo(tbl).append()
    } // v1..v4
    val summary = spark.sql(
      "CALL graftmem.system.expire_snapshots('db.spec_tt_exp', 2)")
      .head()
    assert((summary.getLong(0), summary.getLong(1), summary.getLong(2))
      == ((3L, 2L, 4L))) // expired v0..v2, retained v3+v4, current 4
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 3").count() == 6)
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 4").count() == 10)
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").count()
    }
    assert(err.getMessage.contains("retained: 3..4"), err.getMessage)
    // current reads unaffected
    assert(spark.table(tbl).count() == 10)
    // invalid keep_last rejected
    val bad = intercept[Exception] {
      spark.sql(
        "CALL graftmem.system.expire_snapshots('db.spec_tt_exp', 0)")
        .collect()
    }
    assert(bad.getMessage.contains("keep_last must be >= 1"))
  }

  test("non-numeric version is a loud error") {
    val tbl = fresh("spec_tt_badv")
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'nope'").count()
    }
    assert(err.getMessage.contains("numeric commit version"),
      err.getMessage)
  }

  test("SHOW PROCEDURES lists the catalog's maintenance actions and " +
      "DESCRIBE PROCEDURE surfaces their contracts") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val shown = spark.sql("SHOW PROCEDURES IN graftmem.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(Set("compact", "create_tag", "expire_snapshots")
      .subsetOf(shown), s"got $shown")
    val desc = spark.sql(
      "DESCRIBE PROCEDURE graftmem.system.create_tag").collect()
      .map(_.getString(0)).mkString("\n")
    assert(desc.contains("create_tag"), desc)
  }

  test("b89: snapshot tags resolve via VERSION AS OF and PIN their " +
      "version through retention; duplicates and numeric tags reject") {
    val tbl = fresh("spec_tt_tag")
    val short = tbl.stripPrefix("graftmem.")
    spark.range(5).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    val tagged = spark.sql(
      s"CALL graftmem.system.create_tag('$short', 'baseline', 1L)")
      .collect()
    assert(tagged.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("baseline", 1L)))
    spark.sql(s"UPDATE $tbl SET bal = bal + 10 WHERE key < 3") // v2
    spark.sql(s"UPDATE $tbl SET bal = bal + 100 WHERE key >= 3") // v3
    // keep_last=1 must expire the UNTAGGED v2 and keep the tagged v1
    spark.sql(
      s"CALL graftmem.system.expire_snapshots('$short', 1)").collect()
    assert(spark.sql(s"SELECT sum(bal) FROM $tbl VERSION AS OF 'baseline'")
      .head().getLong(0) == 10L, "the tag must pin v1 past retention")
    val gone = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2").count()
    }
    assert(gone.getMessage.contains("no snapshot"), gone.getMessage)
    // an unknown tag names the known ones
    val unk = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'v_oops'").count()
    }
    assert(unk.getMessage.contains("baseline"), unk.getMessage)
    // duplicate and purely numeric tags reject loudly
    intercept[Exception] {
      spark.sql(
        s"CALL graftmem.system.create_tag('$short', 'baseline', 3L)")
        .collect()
    }
    intercept[Exception] {
      spark.sql(s"CALL graftmem.system.create_tag('$short', '7', 3L)")
        .collect()
    }
    // signed numerics would resolve on the numeric path — rejected too
    intercept[Exception] {
      spark.sql(s"CALL graftmem.system.create_tag('$short', '-1', 3L)")
        .collect()
    }
    // tags are stored trimmed, so a padded CREATE still resolves
    spark.sql(
      s"CALL graftmem.system.create_tag('$short', ' padded ', 3L)")
      .collect()
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 'padded'")
      .head().getLong(0) == 5L)
    // tagging an unretained version rejects
    intercept[Exception] {
      spark.sql(
        s"CALL graftmem.system.create_tag('$short', 'ghost', 2L)")
        .collect()
    }
  }
}
