package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Emits, in order:
  *   1. one JSON line with the full per-query map + raw samples + config
  *      (long; for tools/bench_fold.py and humans),
  *   2. the same full JSON to `target/bench.json` and the committed
  *      artifact path (tail-proof copies),
  *   3. the per-query MINIMA re-emitted near the END of stdout in
  *      tail-survivable form (r14, VERDICT r13 item 1): first split
  *      into parseable chunk lines ≤ ~3.5 KB (each a valid
  *      `"metric":"total"` object carrying a `part`/`parts` slice of
  *      `queries`), then ONE driver-contract line
  *      `{"metric":"total",...,"queries":{all 268 minima},...}`,
  *   4. a compact total-only JSON line LAST — short enough that any
  *      tail-N stdout capture still sees a parseable `"metric":"total"`.
  * Rationale: the driver keeps only a stdout TAIL. Through round 13 the
  * per-query map appeared ONLY in line 1 (several KB, printed first), so
  * the tail cut it and PERF_r12/r13 had `n_common: 0`, empty
  * `per_query`/`scaling`, `bench_ok: false`. Emitting the minima again
  * immediately before the final total line (layered: chunks for a small
  * tail window, one full line for a larger one, compact total for any)
  * is a measurement-CONTRACT fix only — the timed region, methodology
  * and the "queries" values are unchanged.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Scale-adaptive scan splits (r13, guide §2.2/§6): derive the
      // split size from corpus bytes ÷ 2·cores instead of the previous
      // 16 MB constant (a local-mode tuning). The 16 MB FLOOR keeps the
      // single-file toy corpus fanned out across local cores — every SF
      // here lands on it, so bench numbers stay comparable — while a
      // production-sized input walks up to the stock 128 MB cap (large
      // sequential reads, bounded map-task count feeding each shuffle).
      .config("spark.sql.files.maxPartitionBytes",
        graft.util.GraftConf.adaptiveSplitBytes(sfDir, cpus).toString)
      // RDD-path demos (CoreMR) shuffle case classes; Kryo beats Java
      // serialization 2-5x there. SQL rows use Tungsten either way.
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      // Spark's ObjectHashAggregate silently falls back to SORT-based
      // aggregation after 128 distinct keys per partition (the default
      // fallbackThreshold) — which re-introduces, at runtime and
      // invisibly to the plan, exactly the per-partition sort the object
      // aggregates (b33 KMV, b46 top-k) exist to avoid. 1M entries of
      // small bounded buffers is ~100-200 MB per task worst-case; at
      // 100 TB size this knob to the executor heap the same way
      // shuffle.partitions is sized.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      // Joins (guide §3.1; §9 "starting configuration"): prefer shuffled-hash over sort-merge
      // when a build side fits per-partition memory, and let AQE
      // convert an already-planned SMJ whose runtime map output is
      // small. The r13 census measured 32 queries executing
      // SortMergeJoins — almost all of them the row-level MERGE
      // machinery, whose target side may not broadcast — and each
      // conversion deletes two Sort passes. Scale note (two distinct
      // paths, r13-ADVICE): the 64 MB threshold bounds ONLY the AQE
      // SMJ→SHJ conversion, which sees real runtime map sizes;
      // preferSortMergeJoin=false ALSO lets the STATIC planner pick
      // SHJ from plan-time size ESTIMATES, a path with no runtime
      // fallback (a misestimated build side OOMs where SMJ would
      // spill). Here every statically-SHJ-planned build side is a
      // graftmem table reporting EXACT SupportsReportStatistics row
      // counts (no estimate risk) — plans/r14 dumps + Round14OptSpec
      // pin that no large-side/estimated build is statically
      // SHJ-planned; parquet-sided joins stay broadcast or SMJ until
      // AQE converts them under the bounded threshold.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
    // Tuning passthrough: SPARK_GRAFT_CONF="k=v;k=v" (dev experiments).
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.GraftProfiler.install(spark)
    graft.util.GraftProfiler.installPhases(spark)
    // JVM/codegen warmup so the first timed query doesn't absorb
    // whole-stage-codegen compiler startup (~3-4 s once per JVM).
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    // Streaming-engine warmup (microbatch planner, state stores incl.
    // RocksDB + transformWithState, file source/sink commit-log classes
    // load once per JVM), mirroring the d5-d17 query classes.
    try { graft.streaming.StreamingDemo.warmStreaming(spark) }
    catch { case _: Throwable => () }
    // NO base-table cache (round-13 optimization rules): every timed
    // query computes from the parquet inputs, paying its own scan.
    // Earlier rounds cached the ten shared scans here; that hid the
    // per-query scan cost from the timed region and is disallowed as
    // of the optimization rounds (OPTIMIZATION_r13.md declares the
    // methodology change; bench_full_r12/r13 carry the old series).
    // The analyzed-DataFrame memo in Tables.table (file listing +
    // footer schema + analysis, never rows) is unaffected.
    // Per-query MIN over two passes: this host's timing noise band is
    // ±50%+ (consecutive identical runs measured 47 s vs 100 s), and a
    // single sample turns one GC/compile hiccup into the recorded grade.
    // The min of two runs estimates the query's actual cost — the noise
    // is strictly additive (no mechanism makes a query run too fast).
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        // Label every job with its query name (guide §1.5) so the UI,
        // event log and [profile] lines attribute work to queries.
        spark.sparkContext.setJobDescription(name)
        graft.util.GraftProfiler.label = name
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        spark.sparkContext.setJobDescription(null)
        name -> (System.nanoTime() - t0) / 1e9
      }
    val p1 = pass()
    val p2 = pass().toMap
    val results = p1.map { case (name, t) => name -> math.min(t, p2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Raw per-pass samples, so tools/bench_fold.py can compute exact
    // cross-invocation MEDIANS (robust center) alongside the minima
    // (noise floor) when folding several runs into the committed
    // bench_full_r<N>.json artifact.
    val runs = p1.map { case (name, t) =>
      s"\"" + name + s"\":[$t,${p2(name)}]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Split the true-streaming engine floor (state store + checkpoint +
    // microbatch setup per query — swings 2-6× under host load) from
    // the batch-query cost, so the graded tail-parse can tell engine
    // floor from query regression.
    val streaming = results
      .filter { case (k, _) => operators.TierD.streamingNames(k) }
    val streamSec = streaming.map(_._2).sum
    val sub = s""""streaming_sec":$streamSec,"streaming_n":${streaming.size}"""
    // the authoritative classification, embedded so tools/bench_fold.py
    // never re-derives it from a name heuristic that can drift
    val streamNames = operators.TierD.streamingNames.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // Measurement config, embedded so tools/bench_diff.py can refuse
    // apples-to-oranges comparisons (the repo documents ±50% cross-host
    // noise; a diff between different cpu counts is meaningless).
    val conf = s""""config":{"cpus":"$cpus","shuffle_partitions":"${spark.conf.get("spark.sql.shuffle.partitions")}","max_partition_bytes":"${spark.conf.get("spark.sql.files.maxPartitionBytes")}","host_processors":${Runtime.getRuntime.availableProcessors()},"spark_version":"${spark.version}","sf_dir":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec",$sub,"streaming_names":$streamNames,$conf,"queries":$qs,"queries_runs":$runs,"sf":"$sfDir"}"""
    println(full)
    try {
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/bench.json"), full + "\n")
      // Repo-root copy: the driver's BENCH_r0N.json keeps only a
      // 2000-char stdout tail, which truncates the a/b-tier per-query
      // times and blinds round-over-round regression tracking. This
      // file is committed each round (bench_full_r<N>.json) so the
      // FULL {query: seconds} map survives as an artifact.
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_full_latest.json")
      Files.writeString(Paths.get(outPath), full + "\n")
    } catch { case _: Throwable => () }
    spark.stop()
    // Tail-survivable per-query minima (r14, VERDICT r13 item 1). The
    // driver's capture keeps only the last few KB of stdout, so the
    // minima are re-emitted HERE, at the very end, layered by window
    // size. Values are rounded to 0.1 ms — ample for speedup ratios.
    val minEntries = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
    def totalLine(extra: String): String =
      s"""{"metric":"total","value":$total,"unit":"sec",$sub,"n_queries":${results.size},$extra"sf":"$sfDir"}"""
    // 3a. Chunk lines: each a COMPLETE, independently parseable
    //     "metric":"total" object carrying a part/parts slice of the
    //     queries map, sized ≤ ~3.5 KB so even a small line-truncating
    //     capture keeps whole parts.
    val chunks = minEntries.foldLeft(Vector(Vector.empty[String])) {
      (acc, e) =>
        if (acc.last.map(_.length + 1).sum + e.length > 3300)
          acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
    }.filter(_.nonEmpty)
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(totalLine(
        s""""part":${i + 1},"parts":${chunks.size},"queries":${c.mkString("{", ",", "}")},"""))
    }
    // 3b. The driver-contract line: metric/value/unit/queries/sf with
    //     the FULL minima map (~7.5 KB at 268 queries), right before
    //     the final total line per VERDICT r13 item 1.
    println(totalLine(s""""queries":${minEntries.mkString("{", ",", "}")},"""))
    // 4. LAST line: compact, tail-capture-proof under ANY window size.
    println(totalLine(""))
  }
}
