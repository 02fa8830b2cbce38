package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 source: pushdown reaches the scan, pruning reaches the reader
  * schema, split planning parallelizes the range.
  */
class PairGenSourceSpec extends SparkSpec {

  private def load(rows: Int, slices: Int) =
    spark.read.format("pairgen")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("short name resolves via DataSourceRegister and content is deterministic") {
    val df = load(100, 4)
    assert(df.count() == 100)
    val r = df.filter(col("id") === 7L).head()
    // md5("7")
    assert(r.getString(1) == "8f14e45fceea167a5a36dedd4bea2543")
  }

  test("id bounds are pushed into the source (no post-scan Filter node)") {
    val df = load(10000, 8)
      .filter(col("id") >= lit(9000L) && col("id") < lit(9500L))
    assert(df.count() == 500)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
    // the bounds narrowed the generated range itself...
    assert(p.contains("range=[9000,9500)"), p)
    // ...and no post-scan Filter node remains ("RuntimeFilters: []" is
    // part of the scan line, not a Filter node)
    assert(!p.contains("Filter ("), s"filter not fully pushed:\n$p")
  }

  test("column pruning reaches the scan schema") {
    val df = load(1000, 4).select("value")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.sameElements(Array("value")), scan.schema)
  }

  test("range splits across the requested slices") {
    val df = load(1000, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.agg(sum("id")).head().getLong(0) == 999L * 1000L / 2L)
  }

  test("checkpoint restart resumes from committed offsets — exactly-once across stop/start") {
    val sink = graft.util.TmpDir.fresh("pairgen-restart-sink")
    val ckpt = graft.util.TmpDir.fresh("pairgen-restart-ckpt")
    def start() = spark.readStream.format("pairgen")
      .option("rows", "60").option("slices", "2")
      .option("batchRows", "10").load()
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // run 1: stop after at least two committed batches, mid-range
    val q1 = start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 2, "no progress")
    } finally q1.stop()
    // run 2: a FRESH query on the same checkpoint must resume, not replay
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.schema("id LONG, value STRING").parquet(sink)
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until 60L),
      s"not exactly-once: ${ids.length} rows, dups=${ids.length - ids.distinct.length}")
  }

  test("microbatch stream drains the range in batchRows-sized triggers, no loss/dup") {
    val q = spark.readStream.format("pairgen")
      .option("rows", "50").option("slices", "2")
      .option("batchRows", "10").load()
      .writeStream.queryName("pairgen_mb").format("memory")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("pairgen_mb").collect()
    assert(rows.length == 50, s"expected 50 rows, got ${rows.length}")
    assert(rows.map(_.getLong(0)).sorted.sameElements(0L until 50L))
    // rate limit respected: the 50-id range cannot fit in fewer than 5
    // non-empty microbatches at batchRows=10
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 5, q.recentProgress.map(_.numInputRows).toSeq)
    assert(batches.forall(_.numInputRows <= 10),
      batches.map(_.numInputRows).toSeq)
  }
}
