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

  test("v2 predicate pushdown covers the whole comparison family: " +
      "=, >, <=, and literal-first forms all narrow the range") {
    val t = load(10000, 4)
    // equality collapses to a one-row range, no post-scan Filter
    val eq = t.filter(col("id") === lit(7L))
    assert(eq.queryExecution.executedPlan.toString.contains(
      "range=[7,8)"), eq.queryExecution.executedPlan.toString)
    assert(!eq.queryExecution.executedPlan.toString.contains("Filter ("))
    assert(eq.count() == 1)
    // strict > and <= clamp through the saturating successor
    val gt = t.filter(col("id") > lit(9989L) && col("id") <= lit(9994L))
    assert(gt.queryExecution.executedPlan.toString.contains(
      "range=[9990,9995)"), gt.queryExecution.executedPlan.toString)
    assert(gt.collect().map(_.getLong(0)).toSeq ==
      (9990L to 9994L))
    // literal-first comparison arrives flipped and still narrows
    val flipped = t.filter(lit(9995L) <= col("id"))
    assert(flipped.queryExecution.executedPlan.toString.contains(
      "range=[9995,10000)"),
      flipped.queryExecution.executedPlan.toString)
    assert(flipped.count() == 5)
  }

  test("predicate-pushdown fuzz: random comparison conjunctions give " +
      "the same ids as an in-memory reference filter") {
    val rows = 2000
    val t = load(rows, 4)
    val all = (0L until rows.toLong).toSet
    val rnd = new scala.util.Random(20260815L)
    val ops = Seq("=", ">", ">=", "<", "<=")
    (1 to 40).foreach { i =>
      val conj = (1 to (1 + rnd.nextInt(3))).map { _ =>
        // values straddle the range boundary on purpose
        (ops(rnd.nextInt(ops.length)),
          rnd.nextLong(rows.toLong + 200L) - 100L,
          rnd.nextBoolean()) // literal-first form
      }
      val df = conj.foldLeft(t) { case (d, (op, v, flipped)) =>
        d.filter(op match {
          case "="  => col("id") === lit(v)
          case ">"  => if (flipped) lit(v) < col("id") else col("id") > lit(v)
          case ">=" => if (flipped) lit(v) <= col("id") else col("id") >= lit(v)
          case "<"  => if (flipped) lit(v) > col("id") else col("id") < lit(v)
          case "<=" => if (flipped) lit(v) >= col("id") else col("id") <= lit(v)
        })
      }
      val expect = conj.foldLeft(all) { case (s, (op, v, _)) =>
        s.filter(id => op match {
          case "="  => id == v
          case ">"  => id > v
          case ">=" => id >= v
          case "<"  => id < v
          case "<=" => id <= v
        })
      }
      val got = df.select("id").collect().map(_.getLong(0)).toSet
      assert(got == expect,
        s"case $i: $conj -> got ${got.size} rows, expected " +
          s"${expect.size}")
    }
    // the extreme bounds that motivated the saturating successor
    assert(t.filter(col("id") <= lit(Long.MaxValue)).count() == rows)
    assert(t.filter(col("id") > lit(Long.MaxValue)).count() == 0)
    assert(t.filter(col("id") >= lit(Long.MinValue)).count() == rows)
  }

  test("a44: plain scans read COLUMNAR (ColumnarToRow in the plan) " +
      "and the vectorized path is bit-identical to the row path; " +
      "sampled/variant scans keep the row reader") {
    val t = load(10000, 4)
    val q = t.filter(col("id") >= 100L && col("id") < 200L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"plain scan did not plan columnar:\n$plan")
    // bit-equality against the row path: the SAMPLED scan declines
    // columnar (asserted below) but a full-fraction sample keeps every
    // row, so it IS the row reader over the same range
    val viaRow = t.sample(withReplacement = false, 1.0, seed = 1)
      .filter(col("id") >= 100L && col("id") < 200L)
    assert(!viaRow.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"),
      "sampled scan must keep the row reader")
    assert(q.collect().map(_.toString).toSeq ==
      viaRow.collect().map(_.toString).toSeq,
      "columnar and row generators must be bit-identical")
    // the variant shape keeps the row reader too
    val vt = spark.read.format("pairgen").option("rows", "100")
      .option("variant", "true").load()
    assert(!vt.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"))
    assert(vt.count() == 100)
  }

  test("a44+: bucketed scans read COLUMNAR (round 12) and the " +
      "vectorized bucket reader is bit-identical to the closed form; " +
      "descending top-N still keeps the row reader") {
    val bt = spark.read.format("pairgen").option("rows", "1000")
      .option("buckets", "8").load()
    val plan = bt.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"bucketed scan did not plan columnar:\n$plan")
    val got = bt.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = (0L until 1000L).map(i =>
      (i, new String(PairGenSource.md5HexBytes(md, i), "US-ASCII"), i % 8))
    assert(got == exp,
      "bucketed columnar reader must be bit-identical to the generator")
    // a filter narrows the range inside each strided bucket batch
    val f = bt.filter(org.apache.spark.sql.functions.col("id") >= 37L &&
      org.apache.spark.sql.functions.col("id") < 253L)
    assert(f.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(f.collect().map(_.getLong(0)).sorted.toSeq ==
      (37L until 253L).toSeq)
    // the descending fully-pushed top-N partition keeps the row reader
    val d = spark.read.format("pairgen").option("rows", "1000").load()
      .orderBy(org.apache.spark.sql.functions.col("id").desc).limit(5)
    assert(!d.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(d.collect().map(_.getLong(0)).toSeq ==
      Seq(999L, 998L, 997L, 996L, 995L))
  }

  test("a45: _split_id metadata column — hidden from SELECT *, " +
      "split-exact when named, grp-valued on buckets, 0 for pushed " +
      "top-N; columnar and join pushdown decline") {
    val df = load(1000, 4)
    // hidden from star expansion (the metadata-column contract)
    assert(df.schema.fieldNames.toSeq == Seq("id", "value"))
    // named: every row attributes to the split whose range holds it
    val per = df.select(col("id"), col("_split_id"))
      .groupBy("_split_id")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy("_split_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(per.toSeq == (0 until 4).map(i =>
      (i.toLong, 250L, i * 250L, i * 250L + 249L)))
    // metadata columns keep the ROW reader (a44's all-or-nothing)
    assert(!df.select(col("id"), col("_split_id"))
      .queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    // bucketed layout: the partition IS the residue class
    val bt = spark.read.format("pairgen").option("rows", "1000")
      .option("buckets", "8").load()
    assert(bt.filter(col("_split_id") =!= col("grp")).count() == 0)
    // fully-pushed top-N: one partition, split 0, order preserved
    val d = load(1000, 4)
      .select(col("id"), col("_split_id"))
      .orderBy(col("id").desc).limit(3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(d.toSeq == Seq((999L, 0L), (998L, 0L), (997L, 0L)))
    // join pushdown declines a metadata-bearing side: the plan keeps
    // a real join and provenance stays split-true
    val prev = spark.conf.getOption(
      "spark.sql.optimizer.datasourceV2JoinPushdown")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try {
      val l = load(1000, 4).select(col("id"), col("_split_id"))
      val r = load(300, 2)
      val j = l.join(r, "id")
      assert(j.queryExecution.executedPlan.toString.contains("Join"),
        "a metadata-bearing side must decline join pushdown")
      assert(j.count() == 300)
      assert(j.filter(col("_split_id") =!= (col("id") / 250)
        .cast("long")).count() == 0)
    } finally prev match {
      case Some(v) => spark.conf
        .set("spark.sql.optimizer.datasourceV2JoinPushdown", v)
      case None => spark.conf
        .unset("spark.sql.optimizer.datasourceV2JoinPushdown")
    }
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

  test("a35: complete aggregate pushdown — no aggregation operator in the plan") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("pairgen")
      .option("rows", "100000").option("buckets", "8").load()
      .filter(col("id") >= 1000 && col("id") < 90000)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_ids"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PairGenAggScan"),
      s"aggregate did not push into the source:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown still planned an aggregate:\n$plan")
    // values equal a from-scratch recomputation over the RAW row scan
    // (select id+grp only ⇒ the aggregate cannot push on that path)
    val raw = spark.read.format("pairgen")
      .option("rows", "100000").option("buckets", "8").load()
      .filter(col("id") >= 1000 && col("id") < 90000)
      .select("id", "grp").collect()
      .groupBy(_.getLong(1)).view
      .mapValues(rs => (rs.length.toLong,
        rs.map(_.getLong(0)).min, rs.map(_.getLong(0)).max))
    df.collect().foreach { r =>
      val (n, mn, mx) = raw(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, mn, mx)))
    }
    assert(df.count() == 8)
  }

  test("a35: unsupported aggregate falls back to the row scan") {
    import org.apache.spark.sql.functions._
    val f = spark.read.format("pairgen").option("rows", "1000").load()
      .agg(sum("id").as("sum_id"))
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("PairGenScan") && !plan.contains("PairGenAggScan"),
      s"unsupported SUM should not push:\n$plan")
    assert(f.head().getLong(0) == 499500L)
  }

  test("a36: top-N pushes fully — no Sort/TakeOrdered; limit narrows the range") {
    import org.apache.spark.sql.functions._
    val t = spark.read.format("pairgen").option("rows", "100000").load()
    val topn = t.filter(col("id") >= 500).orderBy(col("id").desc).limit(7)
    val plan = topn.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN(desc=true)"),
      s"top-N did not push:\n$plan")
    assert(!plan.contains("TakeOrdered") && !plan.contains("Sort"),
      s"fully-pushed top-N should carry no sort operator:\n$plan")
    assert(topn.collect().map(_.getLong(0)).toSeq ==
      (99999L to 99993L by -1L).toSeq)
    // ascending variant
    val asc = t.orderBy("id").limit(3)
    assert(asc.queryExecution.executedPlan.toString
      .contains("pushedTopN(desc=false)"))
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // bare LIMIT: range narrowed at the source (scan range is [10,15)),
    // Spark's own limit stays (partially-pushed contract)
    val lim = t.filter(col("id") >= 10).limit(5)
    val lplan = lim.queryExecution.executedPlan.toString
    assert(lplan.contains("range=[10,15)"), s"limit did not narrow:\n$lplan")
    assert(lplan.contains("CollectLimit") || lplan.contains("GlobalLimit"))
    assert(lim.count() == 5)
    // bucketed tables decline (grp generation is residue-based; a
    // narrowed contiguous range would lie about the key grouping)
    val b = spark.read.format("pairgen")
      .option("rows", "1000").option("buckets", "4").load()
      .orderBy("id").limit(3)
    assert(!b.queryExecution.executedPlan.toString.contains("pushedTopN"))
    assert(b.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("the limit family declines after a pushed join — ORDER BY over " +
      "the joined relation keeps its Sort and returns correct order") {
    val prev = spark.conf.getOption(
      "spark.sql.optimizer.datasourceV2JoinPushdown")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown",
      "true")
    try {
      import org.apache.spark.sql.functions._
      val l = spark.read.format("pairgen").option("rows", "8000").load()
      val r = spark.read.format("pairgen").option("rows", "5000").load()
        .where(col("id") >= 100)
      val q = l.join(r, l("id") === r("id"))
        .select(l("id").as("jid"))
        .orderBy(col("jid").desc).limit(3)
      val plan = q.queryExecution.executedPlan.toString
      // the join itself still pushes; the top-N must NOT (the joined
      // scan is a plain multi-slice emitter — accepting would let
      // Spark delete its Sort and silently return ascending rows)
      assert(plan.contains("pushedJoin"), plan)
      assert(!plan.contains("pushedTopN"), plan)
      assert(q.collect().map(_.getLong(0)).toSeq ==
        Seq(4999L, 4998L, 4997L))
      // offset after join: also declined, still correct
      val q2 = l.join(r, l("id") === r("id"))
        .select(l("id").as("jid")).orderBy("jid").offset(2).limit(2)
      assert(q2.collect().map(_.getLong(0)).toSeq == Seq(102L, 103L))
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.optimizer.datasourceV2JoinPushdown", v)
      case None => spark.conf.unset(
        "spark.sql.optimizer.datasourceV2JoinPushdown")
    }
  }

  test("TABLESAMPLE pushes into the scan: no Sample operator, " +
      "deterministic and repeatable; unsafe compositions decline") {
    import org.apache.spark.sql.functions._
    val t = spark.read.format("pairgen").option("rows", "20000").load()
    val s1 = t.sample(withReplacement = false, 0.2, seed = 42)
    // no SampleExec operator node (the scan DESCRIPTION now names the
    // pushed sample, so a plain substring check would self-trip)
    assert(s1.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SampleExec => s
    }.isEmpty,
      "sample was not absorbed by the source:\n" +
        s1.queryExecution.executedPlan.toString)
    assert(s1.queryExecution.executedPlan.toString.contains("pushedSample"))
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    // roughly the requested fraction (hash-uniform over 20k ids)
    assert(ids1.size > 3200 && ids1.size < 4800, s"got ${ids1.size}")
    // repeatable: same seed = same subset; different seed differs
    val ids2 = t.sample(withReplacement = false, 0.2, seed = 42)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids2 == ids1, "same seed must resample identically")
    val ids3 = t.sample(withReplacement = false, 0.2, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids3 != ids1, "different seeds must differ")
    // pushed filters compose (sample first — the Sample node must sit
    // directly over the relation for the engine to offer it; the
    // later filter then narrows the same sampled stream)
    val f = t.sample(withReplacement = false, 0.2, seed = 42)
      .filter(col("id") >= 10000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(f == ids1.filter(_ >= 10000L),
      "pushed sample + pushed filter must compose")
    // the limit family declines on a sampled scan — Spark keeps its
    // own limit, so the row count contract survives
    val lim = t.sample(withReplacement = false, 0.2, seed = 42).limit(50)
    assert(lim.count() == 50)
    // an aggregate over a sampled scan must NOT collapse closed-form
    val agg = t.sample(withReplacement = false, 0.2, seed = 42)
      .agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString
      .contains("PairGenAggScan"),
      "closed-form aggregate over a sampled scan would ignore the " +
        "sample")
    assert(agg.head().getLong(0) == ids1.size)
  }

  test("a pushed sample scales the reported statistics: the sampled " +
      "side of a join broadcasts on its TRUE size, and the plan names " +
      "the sample") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // unsampled, both sides ~90-100M rows: no plan-time broadcast
      // (a38 proves this); sampling one side at 1e-4 (~9k rows) must
      // flip it — only the sample-scaled statistics can justify that
      val big = spark.read.format("pairgen")
        .option("rows", "100000000").load()
      val sampled = spark.read.format("pairgen")
        .option("rows", "90000000").load()
        .sample(withReplacement = false, 0.0001, seed = 1)
        .withColumnRenamed("value", "v2")
      val p = big.join(sampled, Seq("id"))
        .agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"sample-scaled stats did not drive the broadcast:\n$p")
      // the sampled scan is visible as such in the plan
      assert(p.contains("pushedSample"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("Trigger.AvailableNow drains the stream in rate-limited " +
      "batches and stops on its own") {
    import org.apache.spark.sql.streaming.Trigger
    val sink = graft.util.TmpDir.fresh("pairgen-an-sink")
    val ckpt = graft.util.TmpDir.fresh("pairgen-an-ckpt")
    val src = spark.readStream.format("pairgen")
      .option("rows", "1000").option("batchRows", "300").load()
    val q = src.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // the query must TERMINATE without processAllAvailable/stop —
    // that is AvailableNow's backfill-and-stop contract
    assert(q.awaitTermination(120000), "AvailableNow did not stop")
    val got = spark.read.schema(src.schema).parquet(sink)
    assert(got.count() == 1000)
    assert(got.agg(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col("id"))).head().getLong(0)
      == 1000, "drain lost or duplicated rows")
    // admission control held: 1000 rows at 300/batch = 4 microbatches
    assert(q.recentProgress.length >= 4,
      s"expected >= 4 rate-limited batches, got " +
        s"${q.recentProgress.length}")
    // ReportsSourceMetrics: the source's lag gauge surfaces in every
    // progress event and reads 0 once the range is drained
    val metrics = q.recentProgress.last.sources.head.metrics
    assert(metrics.get("idsBehindLatest") == "0",
      s"drained source must report zero lag, got $metrics")
    assert(metrics.get("rangeEnd") == "1000")
    val firstLag = q.recentProgress.head.sources.head.metrics
      .get("idsBehindLatest").toLong
    assert(firstLag > 0 && firstLag <= 1000,
      s"the first batch must still see lag, got $firstLag")
  }

  test("Trigger.Continuous runs the epoch engine: long-running readers " +
      "drain the range exactly once into the memory sink") {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("pairgen")
      .option("rows", "1000").option("slices", "2").load()
    val q = src.selectExpr("id", "value", "id % 7 AS m7")
      .writeStream.format("memory").queryName("pg_cont")
      .trigger(Trigger.Continuous("200 milliseconds"))
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("pg_cont").count() < 1000 &&
        System.currentTimeMillis() < deadline && q.exception.isEmpty)
        Thread.sleep(200)
      q.exception.foreach(throw _)
      // let at least one more epoch commit past the drain, then check
      // exactly-once: no duplicates, full range, correct content
      Thread.sleep(500)
      val got = spark.table("pg_cont").collect()
      assert(got.length == 1000, s"got ${got.length} rows")
      assert(got.map(_.getLong(0)).toSet == (0L until 1000L).toSet)
      val r7 = got.find(_.getLong(0) == 7L).get
      assert(r7.getString(1) == "8f14e45fceea167a5a36dedd4bea2543")
      assert(r7.getLong(2) == 0L)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS pg_cont")
    }
  }

  test("OFFSET pushdown completes the limit family: the scan emits " +
      "exactly the requested window, ascending and descending") {
    import org.apache.spark.sql.functions._
    val t = spark.read.format("pairgen").option("rows", "100000").load()
    // ORDER BY id LIMIT 5 OFFSET 100 → ids 100..104, range-narrowed
    val asc = t.orderBy("id").offset(100).limit(5)
    assert(asc.collect().map(_.getLong(0)).toSeq ==
      (100L to 104L).toSeq)
    assert(asc.queryExecution.executedPlan.toString
      .contains("range=[100,105)"),
      asc.queryExecution.executedPlan.toString)
    // descending: OFFSET drops the HIGHEST ids
    val desc = t.orderBy(col("id").desc).offset(3).limit(4)
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      (99996L to 99993L by -1L).toSeq)
    assert(desc.queryExecution.executedPlan.toString
      .contains("range=[99993,99997)"),
      desc.queryExecution.executedPlan.toString)
    // offset past the range → empty, not negative
    assert(t.filter(col("id") >= 99998).orderBy("id").offset(10)
      .collect().isEmpty)
  }

  test("a38: reported statistics drive a PLAN-TIME broadcast (AQE off)") {
    import org.apache.spark.sql.functions._
    val keys = Seq("spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = spark.read.format("pairgen").option("rows", "200000").load()
      def join(smallRows: String) = big.join(
        spark.read.format("pairgen").option("rows", smallRows).load()
          .withColumnRenamed("value", "v2"),
        Seq("id")).agg(count(lit(1)).as("n"))
      // under-threshold reported size ⇒ broadcast chosen with NO hint
      // and NO runtime size probe — only the connector's statistics
      // can justify it at plan time
      val p1 = join("2000").queryExecution.executedPlan.toString
      assert(p1.contains("BroadcastHashJoin"),
        s"stats did not drive a plan-time broadcast:\n$p1")
      // BOTH sides over threshold ⇒ no broadcast (plan-only; never
      // executed). The stats cut both ways: the first assertion's
      // "big" side would itself broadcast after column pruning
      // (200k × 8 B), which is the report being CORRECT, not a bug.
      val big2 = spark.read.format("pairgen")
        .option("rows", "100000000").load()
      val p2 = big2.join(
        spark.read.format("pairgen").option("rows", "90000000").load()
          .withColumnRenamed("value", "v2"),
        Seq("id")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(!p2.contains("BroadcastHashJoin"),
        s"two over-threshold sides must not broadcast:\n$p2")
      // numbers flow from the narrowed range: filter + join-key
      // equivalence narrow BOTH generated ranges
      val df = graft.SparkEntry.queries("a38_source_stats_broadcast")(
        spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("range=[1000,2000)") &&
        plan.contains("range=[1000,200000)"),
        s"pushed bound did not propagate through the join:\n$plan")
      val r = df.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((1000L, 1000L, 1999L, 1000L)))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("a37: runtime filter skips bucket partitions — proven by the scan metric") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("a37_source_runtime_filter")(
      spark, sf0001)
    val rows = df.collect()
    // only region keys 1 (AMERICA) and 2 (ASIA) survive the dim filter
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.getLong(1) == 12500L))
    // the runtime IN predicate reached the scan…
    def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val plan = finalPlan(df.queryExecution.executedPlan)
    assert(plan.toString.contains("dynamicpruningexpression"),
      s"no runtime filter on the scan:\n$plan")
    // …and actually pruned: the scan EMITTED two buckets' worth of
    // rows (2 × 12500), not the full 100000 — partition skipping, not
    // join-side post-filtering. (Hand traversal: AQE hides the scan
    // inside query stages that collectWithSubqueries won't enter.)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val scans = allNodes(plan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.toString.contains("PairGenScan") => b
    }
    assert(scans.nonEmpty)
    // the declared ORDER BY plans a range exchange whose boundary
    // SAMPLING pass executes the scan a second time, so the metric
    // reads 2 × (2 buckets × 12500). Unpruned, either pass alone
    // would already exceed that.
    val emitted = scans.map(_.metrics("numOutputRows").value).max
    assert(emitted % 25000L == 0L && emitted <= 50000L,
      s"scan emitted $emitted rows — runtime pruning did not skip buckets")
  }

  test("a35: empty range — grouped buckets vanish, global aggregate emits one row") {
    import org.apache.spark.sql.functions._
    // `id >= rows` is empty only given the SOURCE's row count, which
    // the optimizer cannot see — so the connector (not constant
    // folding) must produce the empty-range semantics
    val grouped = spark.read.format("pairgen")
      .option("rows", "50").option("buckets", "8").load()
      .filter(col("id") >= 50)
      .groupBy("grp").agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.executedPlan.toString
      .contains("PairGenAggScan"))
    assert(grouped.count() == 0,
      "empty buckets must emit no group rows, matching the engine")
    val global = spark.read.format("pairgen").option("rows", "50").load()
      .filter(col("id") >= 50)
      .agg(count(lit(1)).as("n"), min("id").as("mn"))
    val r = global.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1),
      "global aggregate over zero rows is one row: count=0, NULL min")
  }
}
