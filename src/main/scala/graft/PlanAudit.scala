package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the named queries (or a
  * default audit set) so pushdown/broadcast/partial-agg claims can be
  * checked against the real plan (SURVEY §4.2).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Bench's join-strategy defaults so dumped plans match
      // what the bench session actually executes (see Bench.scala)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("b1_scan_filter_project", "b3_join_broadcast", "a16_wordcount",
        "b7_agg_hash", "b2_join_inner_hash")
    names.foreach { n =>
      println(s"########## $n ##########")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
