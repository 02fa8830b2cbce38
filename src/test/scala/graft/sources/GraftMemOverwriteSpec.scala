package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.functions.{col, lit}

/** The overwrite write faces (b86): dynamic partition overwrite
  * replaces exactly the groups the new rows land in (untouched groups
  * keep their row OBJECTS — the copy-on-write narrowing), filter
  * overwrite is replaceWhere, static INSERT OVERWRITE PARTITION
  * routes through the same predicate path, and unsupported predicates
  * are rejected at plan time instead of silently widening.
  */
class GraftMemOverwriteSpec extends SparkSpec {

  private def freshPart(name: String): (String, GraftMemTable) = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, bal BIGINT) " +
      "PARTITIONED BY (g)")
    val t = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemTable]
    (tbl, t)
  }

  private def snap(tbl: String) =
    spark.sql(s"SELECT key, g, bal FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("dynamic partition overwrite replaces exactly the written " +
      "groups; untouched groups keep their row objects") {
    val (tbl, table) = freshPart("spec_ow_dyn")
    spark.range(20)
      .selectExpr("id AS key", "id % 4 AS g", "id * 10 AS bal")
      .writeTo(tbl).append()
    val beforeObjs = table.rows.filter(_._1 != 1L).map(_._2)
      .map(System.identityHashCode).toSet
    // corrected reload of group 1 only
    spark.range(100, 103)
      .selectExpr("id AS key", "CAST(1 AS BIGINT) AS g",
        "id * 1000 AS bal")
      .writeTo(tbl).overwritePartitions()
    val expect = (0L until 20L).filter(_ % 4 != 1)
      .map(k => (k, k % 4, k * 10)) ++
      (100L until 103L).map(k => (k, 1L, k * 1000))
    assert(snap(tbl) == expect.sortBy(_._1))
    val afterObjs = table.rows.filter(_._1 != 1L).map(_._2)
      .map(System.identityHashCode).toSet
    assert(afterObjs == beforeObjs,
      "dynamic overwrite rewrote rows of untouched groups")
  }

  test("filter overwrite (replaceWhere) deletes matching rows and " +
      "appends the new; static INSERT OVERWRITE PARTITION routes " +
      "through the same path") {
    val (tbl, _) = freshPart("spec_ow_filt")
    spark.range(12)
      .selectExpr("id AS key", "id % 3 AS g", "id AS bal")
      .writeTo(tbl).append()
    spark.range(200, 202)
      .selectExpr("id AS key", "CAST(0 AS BIGINT) AS g",
        "id * 7 AS bal")
      .writeTo(tbl).overwrite(col("g") === lit(0L))
    val afterFilter = (0L until 12L).filter(_ % 3 != 0)
      .map(k => (k, k % 3, k)) ++
      (200L until 202L).map(k => (k, 0L, k * 7))
    assert(snap(tbl) == afterFilter.sortBy(_._1))
    // SQL static partition overwrite: replace g = 2 wholesale
    spark.sql(s"INSERT OVERWRITE $tbl PARTITION (g = 2) " +
      "SELECT key, bal * 100 AS bal FROM (SELECT 300 AS key, " +
      "1 AS bal UNION ALL SELECT 301, 2)")
    val afterStatic = afterFilter.filter(_._2 != 2L) ++
      Seq((300L, 2L, 100L), (301L, 2L, 200L))
    assert(snap(tbl) == afterStatic.sortBy(_._1))
  }

  test("unsupported overwrite predicates are rejected at plan time") {
    val (tbl, _) = freshPart("spec_ow_bad")
    spark.range(5)
      .selectExpr("id AS key", "id % 2 AS g", "id AS bal")
      .writeTo(tbl).append()
    val err = intercept[Exception] {
      spark.range(1)
        .selectExpr("id AS key", "CAST(0 AS BIGINT) AS g", "id AS bal")
        .writeTo(tbl).overwrite(col("g") > lit(0L))
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: chain(t.getCause)
    assert(chain(err).exists(m => m != null &&
      m.contains("graftmem overwrite supports")), chain(err).toString)
    // nothing was deleted by the failed attempt
    assert(snap(tbl).size == 5)
  }
}
