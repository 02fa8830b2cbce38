package graft.sources

import graft.SparkSpec

/** Partition evolution (b103): set_partition as a metadata-only
  * commit, legacy-generation visibility rules, migration-on-touch,
  * and the b97 metadata-delete interplay.
  */
class GraftMemPartitionEvolutionSpec extends SparkSpec {

  test("b103 set_partition: metadata-only evolution — row objects " +
      "untouched, SHOW PARTITIONS follows the current spec, new " +
      "writes land partitioned") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = "graftmem.db.spec_b103_evo"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, v BIGINT)")
    spark.range(8).selectExpr("id AS key", "id % 2 AS g", "id AS v")
      .writeTo(tbl).append() // the legacy generation
    val t = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_b103_evo"))
      .asInstanceOf[GraftMemTable]
    val rowObjsBefore = t.rows.map(_._2)
    spark.sql(s"CALL graftmem.system.set_partition('db.spec_b103_evo'," +
      s" 'g')").collect()
    // metadata-only: every row ARRAY is the same object (the group
    // re-tag is per-file metadata, never a data pass)
    assert(t.rows.map(_._2).zip(rowObjsBefore).forall(p => p._1 eq p._2),
      "evolution must not touch row data")
    // the catalog now reports the transform; new writes land grouped
    assert(t.partitioning().map(_.toString).toSeq == Seq("identity(g)"))
    spark.range(100, 104).selectExpr("id AS key", "id % 2 AS g",
      "id AS v").writeTo(tbl).append()
    // SHOW PARTITIONS: only the current spec's groups — the legacy
    // generation has no partition identifier (Iceberg old-spec files)
    val parts = spark.sql(s"SHOW PARTITIONS $tbl").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("g=0", "g=1"), s"got $parts")
    // __partitions (the operational read) reports BOTH generations
    val pstats = spark.table(s"${tbl}__partitions").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pstats(Long.MinValue) == 8L, s"legacy generation missing: $pstats")
    assert(pstats(0L) == 2L && pstats(1L) == 2L, s"got $pstats")
    // guards: re-evolving and CREATE-partitioned tables reject loudly
    val e1 = intercept[Exception] {
      spark.sql(s"CALL graftmem.system.set_partition(" +
        s"'db.spec_b103_evo', 'v')").collect()
    }
    assert(e1.getMessage.contains("already partitioned"), e1.getMessage)
  }

  test("b103 migration-on-touch: a row-level op touching the legacy " +
      "generation re-lands it under the current spec; b97's metadata " +
      "delete declines while legacy rows exist, works after") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = "graftmem.db.spec_b103_mig"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, v BIGINT)")
    spark.range(9).selectExpr("id AS key", "id % 3 AS g", "id AS v")
      .writeTo(tbl).append() // legacy
    spark.sql(s"CALL graftmem.system.set_partition('db.spec_b103_mig'," +
      s" 'g')").collect()
    spark.range(100, 106).selectExpr("id AS key", "id % 3 AS g",
      "id AS v").writeTo(tbl).append() // gen 1, partitioned
    // a partition-predicate DELETE must DECLINE to metadata while the
    // legacy generation exists — the predicate says nothing about it
    // by metadata (b97's pushback rule)
    val d1 = spark.sql(s"DELETE FROM $tbl WHERE g = 1")
    assert(d1.queryExecution.executedPlan.toString.contains("ReplaceData"),
      "metadata delete must decline while legacy rows exist")
    // the row-level DELETE scanned group 1 AND the legacy generation
    // (its g=1 rows matched) — the legacy remainder re-landed under
    // the current spec: migration on touch
    val t = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_b103_mig"))
      .asInstanceOf[GraftMemTable]
    assert(!t.rows.exists(_._1 == Long.MinValue),
      "the touched legacy generation must migrate to the current spec")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = ((0L until 9L) ++ (100L until 106L))
      .filter(_ % 3 != 1).map(k => (k, k % 3))
    assert(got == expect, s"got $got")
    // with the legacy generation gone, the SAME predicate shape now
    // executes as a metadata-only group drop
    val d2 = spark.sql(s"DELETE FROM $tbl WHERE g = 2")
    val p2 = d2.queryExecution.executedPlan.toString
    assert(p2.contains("DeleteFromTable") && !p2.contains("ReplaceData"),
      s"post-migration partition delete must be metadata-only:\n$p2")
    assert(spark.table(tbl).collect().forall(_.getLong(1) == 0L))
  }

}
