package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: dump the formatted physical plan of the row-level
  * commands the graftmem lifecycle queries execute (MERGE ReplaceData /
  * WriteDelta), which PlanAudit cannot reach because they run INSIDE the
  * query functions. Mirrors b75's setup.
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      // mirror Bench's join-strategy defaults unless overridden via
      // SPARK_GRAFT_CONF, so dumped command plans match the bench
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.util.DemoTables.freshGraftmem(spark, d, "devexp",
      "(key BIGINT, bal_cents BIGINT)")
    graft.util.Tables.customer(spark, d)
      .selectExpr("c_custkey AS key",
        "CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents")
      .writeTo(base).append()
    graft.util.Tables.customer(spark, d).createOrReplaceTempView("g_cust_dev")
    val merge =
      s"""MERGE INTO $base t USING (
         |  SELECT c_custkey AS key, c_acctbal FROM g_cust_dev
         |  WHERE c_custkey % 10 = 3) s
         |ON t.key = s.key
         |WHEN MATCHED THEN UPDATE SET bal_cents = t.bal_cents + 1000000
         |WHEN NOT MATCHED THEN INSERT (key, bal_cents) VALUES (s.key, 0)
         |""".stripMargin
    println("########## MERGE (CoW ReplaceData) ##########")
    println(spark.sql("EXPLAIN FORMATTED " + merge).collect()(0).getString(0))
    val mor = graft.util.DemoTables.freshGraftmem(spark, d, "devexpmor",
      "(key BIGINT, bal_cents BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    graft.util.Tables.customer(spark, d)
      .selectExpr("c_custkey AS key",
        "CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents")
      .writeTo(mor).append()
    println("########## MERGE (MoR WriteDelta) ##########")
    println(spark.sql("EXPLAIN FORMATTED " + merge.replace(base, mor))
      .collect()(0).getString(0))
    spark.stop()
  }
}
