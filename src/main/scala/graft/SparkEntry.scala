package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §0.1/§7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The canonical reference program [mrs: examples/wordcount.py].
    */
  def entry(spark: SparkSession): DataFrame =
    operators.TierA.wordcount(spark, "/root/testdata/sf0.001")

  private lazy val all: Seq[QueryDef] =
    operators.TierA.defs ++ operators.TierB.defs ++
      operators.TierC.defs ++ operators.TierD.defs

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
