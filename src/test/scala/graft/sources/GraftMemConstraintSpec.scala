package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** Table CHECK constraints (b87): declared at CREATE, stored and
  * reported by the connector, ENFORCED BY THE ENGINE on every write
  * plan — a violating row fails the write before the commit, and the
  * table is untouched.
  */
class GraftMemConstraintSpec extends SparkSpec {

  private def cat(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  test("CHECK constraint: engine rejects violating appends; the " +
      "failed write leaves no rows behind") {
    cat()
    val tbl = "graftmem.db.spec_ck"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT, " +
      "CONSTRAINT bal_nonneg CHECK (bal >= 0))")
    val t = cat().loadTable(Identifier.of(Array("db"), "spec_ck"))
    assert(t.constraints().length == 1)
    assert(t.constraints()(0).name() == "bal_nonneg")
    spark.range(5).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append()
    assert(spark.table(tbl).count() == 5)
    val err = intercept[Exception] {
      spark.range(3).selectExpr("id AS key", "id - 2 AS bal")
        .writeTo(tbl).append() // bal = -2, -1, 0 → violations
    }
    def chain(e: Throwable): List[String] =
      if (e == null) Nil else (e.getMessage :: chain(e.getCause))
    assert(chain(err).exists(m => m != null && m.contains("bal_nonneg")),
      chain(err).toString)
    assert(spark.table(tbl).count() == 5,
      "failed constrained write landed rows")
  }

  test("CHECK constraint holds through MERGE: a violating update arm " +
      "fails, a conforming one lands") {
    cat()
    val tbl = "graftmem.db.spec_ck_m"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT, " +
      "CONSTRAINT bal_cap CHECK (bal < 1000))")
    spark.range(4).selectExpr("id AS key", "id * 100 AS bal")
      .writeTo(tbl).append()
    val err = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t
           |USING (SELECT key FROM $tbl) b ON t.key = b.key
           |WHEN MATCHED THEN UPDATE SET bal = bal + 900""".stripMargin)
    }
    def chain(e: Throwable): List[String] =
      if (e == null) Nil else (e.getMessage :: chain(e.getCause))
    assert(chain(err).exists(m => m != null && m.contains("bal_cap")),
      chain(err).toString)
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING (SELECT key FROM $tbl) b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET bal = bal + 1""".stripMargin)
    val got = spark.sql(s"SELECT key, bal FROM $tbl ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L until 4L).map(k => (k, k * 100 + 1)))
  }
}
