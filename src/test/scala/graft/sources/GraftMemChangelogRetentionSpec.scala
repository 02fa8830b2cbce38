package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.functions.col

/** b98 — change-log retention: pruning is feed maintenance (content /
  * version / snapshots untouched), reads below the floor fail loudly,
  * logical offsets stay stable so a live checkpointed consumer ahead
  * of the cut resumes untouched, and a consumer retention outran gets
  * an explicit error, never silent partial history.
  */
class GraftMemChangelogRetentionSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def fresh(name: String): (String, GraftMemMorTable) = {
    catalog()
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    (tbl, catalog().loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemMorTable])
  }

  test("retention is maintenance, not a commit: content, version and " +
      "snapshots untouched; reads below the floor fail loudly; reads " +
      "at/above it serve exactly the retained history") {
    val (tbl, table) = fresh("spec_clr")
    spark.range(6).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET bal = 100 WHERE key = 2") // v2
    spark.sql(s"DELETE FROM $tbl WHERE key = 5") // v3
    val contentBefore = spark.table(tbl).collect().map(_.toSeq).toSeq
    val histBefore = spark.table(s"${tbl}__history").collect().length
    val vBefore = table.synchronized(table.commitVersion)
    val res = spark.sql(
      "CALL graftmem.system.expire_changelog('db.spec_clr', 2L)")
      .collect()(0)
    assert(res.getLong(0) == 6L && res.getLong(2) == 2L, res.toString)
    assert(table.synchronized(table.commitVersion) == vBefore,
      "retention must not commit")
    assert(spark.table(tbl).collect().map(_.toSeq).toSeq == contentBefore)
    assert(spark.table(s"${tbl}__history").collect().length == histBefore,
      "snapshots are governed by expire_snapshots, not the feed cut")
    // below the floor: loud
    val e1 = intercept[Exception] {
      spark.table(s"${tbl}__changes").count()
    }
    assert(e1.getMessage.contains("expired by changelog retention"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.option("startingVersion", "1")
        .table(s"${tbl}__changes").count()
    }
    assert(e2.getMessage.contains("expired"), e2.getMessage)
    // at/above: exactly the retained history
    val got = spark.read.option("startingVersion", "2")
      .table(s"${tbl}__changes")
      .select("_commit_version", "_change_type", "key")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2, e._3)).toSeq
    assert(got == Seq((2L, "delete", 2L), (2L, "insert", 2L),
      (3L, "delete", 5L)), got.toString)
    // idempotent / monotone: a lower cut later is a no-op on the floor
    spark.sql(
      "CALL graftmem.system.expire_changelog('db.spec_clr', 1L)").collect()
    assert(table.synchronized(table.changelogFloor) == 2L)
  }

  test("logical offsets survive retention: a live checkpointed " +
      "consumer ahead of the cut resumes untouched and receives " +
      "exactly the post-cut commits") {
    val (tbl, _) = fresh("spec_clr_stream")
    spark.range(4).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    val sink = graft.util.TmpDir.fresh("clr-sink")
    val ckpt = graft.util.TmpDir.fresh("clr-ckpt")
    val src = spark.readStream.table(s"${tbl}__changes")
    val q = src.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // consumed through v1
      // retention cuts BEHIND the consumer, then a new commit lands
      spark.sql(
        "CALL graftmem.system.expire_changelog('db.spec_clr_stream', 2L)")
        .collect()
      spark.sql(s"UPDATE $tbl SET bal = 777 WHERE key = 1") // v2
      q.processAllAvailable() // offsets stable: exactly the v2 slice
    } finally q.stop()
    val got = spark.read.schema(src.schema).parquet(sink)
      .select("_commit_version", "_change_type", "key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2, e._3)).toSeq
    assert(got == Seq((1L, "insert", 0L), (1L, "insert", 1L),
      (1L, "insert", 2L), (1L, "insert", 3L),
      (2L, "delete", 1L), (2L, "insert", 1L)), got.toString)
    // a FRESH full-history subscription now fails loudly at start
    val sink2 = graft.util.TmpDir.fresh("clr-sink2")
    val q2 = spark.readStream.table(s"${tbl}__changes")
      .writeStream.format("parquet").option("path", sink2)
      .option("checkpointLocation", graft.util.TmpDir.fresh("clr-ckpt2"))
      .outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(err.getMessage.contains("expired by changelog retention") ||
      Option(err.getCause).exists(
        _.getMessage.contains("expired by changelog retention")),
      err.getMessage)
  }

  test("a consumer retention outran gets an explicit error on " +
      "restart, never silent partial history") {
    val (tbl, table) = fresh("spec_clr_outrun")
    spark.range(3).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    val sink = graft.util.TmpDir.fresh("clro-sink")
    val ckpt = graft.util.TmpDir.fresh("clro-ckpt")
    def subscribe() = spark.readStream
      .option("startingVersion", "1").table(s"${tbl}__changes")
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q = subscribe()
    try q.processAllAvailable() finally q.stop() // committed offset = 3
    // while the consumer is DOWN: a new commit lands and retention
    // prunes PAST the consumer's committed offset
    spark.sql(s"UPDATE $tbl SET bal = 9 WHERE key = 0") // v2
    spark.sql(
      "CALL graftmem.system.expire_changelog('db.spec_clr_outrun', 3L)")
      .collect() // prunes v1 AND v2: base > committed offset
    assert(table.synchronized(table.changelogBase) == 5L)
    val q2 = subscribe() // resumes from its checkpoint... behind base
    spark.sql(s"UPDATE $tbl SET bal = 10 WHERE key = 1") // v3: new data
    val err = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(err.getMessage.contains("retention outran this consumer") ||
      Option(err.getCause).exists(
        _.getMessage.contains("retention outran this consumer")),
      err.getMessage)
  }
}
