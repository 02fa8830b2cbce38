package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time individual declared queries under the SAME session
  * config as [[Bench]] (cpus, shuffle partitions, object-agg threshold,
  * Kryo, warmups), so single-query A/B numbers transfer to the graded
  * bench. `SPARK_GRAFT_CONF="k=v;k=v"` passes
  * tuning overrides, `SPARK_GRAFT_SF_DIR` picks the corpus.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes",
        graft.util.GraftConf.adaptiveSplitBytes(d, cpus).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      // mirror Bench's join-strategy defaults (see Bench.scala)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.GraftProfiler.install(spark)
    graft.util.GraftProfiler.installPhases(spark)
    graft.util.GraftProfiler.installJobs(spark)
    // SPARK_GRAFT_STREAM_PROFILE=1: dump each microbatch's phase
    // durations (queryPlanning/getBatch/addBatch/walCommit/stateStore
    // commit) so streaming fixed cost can be attributed, not guessed.
    if (sys.env.contains("SPARK_GRAFT_STREAM_PROFILE"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit =
            println(s"[stream] started ${e.name} at ${System.nanoTime() / 1e9}")
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            println(s"[stream] ${e.progress.name} batch=${e.progress.batchId} " +
              s"rows=${e.progress.numInputRows} durMs=${e.progress.durationMs}")
            e.progress.stateOperators.foreach { so =>
              println(s"[state] op=${so.operatorName} commitMs=${so.commitTimeMs} " +
                s"rowsTotal=${so.numRowsTotal} custom=${so.customMetrics}")
            }
          }
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            println(s"[stream] terminated at ${System.nanoTime() / 1e9}")
        })
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    try { graft.streaming.StreamingDemo.warmStreaming(spark) }
    catch { case _: Throwable => () }
    // No base-table cache — mirrors Bench (round-13 methodology change;
    // see OPTIMIZATION_r13.md), so single-query A/B numbers keep
    // transferring to the graded bench.
    for (name <- args; i <- 1 to 3) {
      spark.sparkContext.setJobDescription(s"$name#$i")
      graft.util.GraftProfiler.label = s"$name#$i"
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      spark.sparkContext.setJobDescription(null)
      println(f"[timeq] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
