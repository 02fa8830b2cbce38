package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the round-9 additions beyond the blanket
  * smoke/oracle gates.
  */
class Round9PropsSpec extends SparkSpec {

  test("d22: restart recovery is exactly-once — two runs, one checkpoint, batch-equal result") {
    val (df, info) =
      graft.streaming.StreamingDemo.restartRecoveryWithInfo(spark, sf0001)
    // the recovery genuinely happened: the SAME logical query (one id)
    // executed as two DISTINCT runs (two runIds), and each run
    // committed at least one batch into the shared checkpoint, with
    // run 2's batch numbering continuing where run 1 stopped.
    assert(info.queryId1 == info.queryId2,
      "restart must resume the same query id from the checkpoint")
    assert(info.runId1 != info.runId2, "two runs must have distinct runIds")
    assert(info.batchesRun1.nonEmpty, "run 1 committed no batch")
    assert(info.batchesRun2.nonEmpty, "run 2 committed no batch")
    assert(info.batchesRun2.min > info.batchesRun1.max,
      s"run 2 batches ${info.batchesRun2} must extend run 1's ${info.batchesRun1}")
    // no row lost or doubled: the two-run output equals the one-shot
    // batch aggregate restricted to watermark-closed windows.
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.map(t => (t._1, t._2)).distinct.size == got.size,
      "duplicate (window, type) rows — a batch was doubled across the restart")
    val ev = graft.util.Tables.events(spark, sf0001)
    val mxS = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000000L
    val exp = ev
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(expr("unix_micros(ws) div 1000000").as("start_s"),
        col("event_type"), col("cnt"))
      .filter(col("start_s") + 7200L <= mxS)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.toSet == exp.toSet,
      s"restart output diverged from batch: missing=${exp.toSet -- got.toSet} extra=${got.toSet -- exp.toSet}")
    assert(got.nonEmpty)
  }

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("b72: scripting loop exit equals the replayed doubling recurrence") {
    val r = q("b72_sql_scripting").collect()
    assert(r.length == 1)
    val (th, nAbove) = (r(0).getLong(0), r(0).getLong(1))
    // replay the loop on the batch table: th must be the FIRST level of
    // the doubling grid from 6400 whose count drops below 1000, and
    // n_above that count
    val orders = graft.util.Tables.table(spark, sf0001, "orders")
    def cnt(t: Long): Long =
      orders.filter(col("o_totalprice") >= t).count()
    var expTh = 6400L
    while (cnt(expTh) >= 1000) expTh *= 2
    assert(th == expTh, s"threshold $th != replayed $expTh")
    assert(nAbove == cnt(expTh) && nAbove < 1000)
  }

  test("b73: SQL UDF is analyzer-inlined — no UDF node, predicate pushed to scan") {
    // the declared query's plan: no black-box UDF survives inlining
    val plan = q("b73_sql_udf").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"),
      "SQL UDF left a UDF node in the physical plan — not inlined")
    // a UDF-built predicate reaches the scan's pushed filters: rebuild
    // the scalar UDF against the fixture table and filter through it
    val s2 = spark
    graft.util.Tables.table(s2, sf0001, "lineitem")
      .createOrReplaceTempView("g_lineitem_b73spec")
    s2.sql("""CREATE OR REPLACE TEMPORARY FUNCTION g_rev_spec(p DOUBLE, d DOUBLE)
              RETURNS DOUBLE RETURN p * (1.0 - d)""")
    val df = s2.sql(
      """SELECT count(*) AS n FROM g_lineitem_b73spec
         WHERE l_extendedprice > 900.0""")
    val pushed = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_extendedprice"),
      s"plain predicate did not push: $pushed")
    val df2 = s2.sql(
      """SELECT count(*) AS n FROM g_lineitem_b73spec
         WHERE g_rev_spec(l_extendedprice, 0.0) > 900.0""")
    // after inlining, p * (1.0 - 0.0) constant-folds to the bare column
    // and the comparison pushes to parquet exactly like the plain form
    val pushed2 = df2.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed2.contains("l_extendedprice"),
      s"UDF-built predicate did not push: $pushed2")
    assert(df2.head().getLong(0) == df.head().getLong(0))
  }

  test("b74: pipe chain plans identically to the nested-SELECT form") {
    val piped = q("b74_sql_pipe")
    // the pipe filter (below the EXTEND) must reach the parquet scan
    val plan = piped.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate"),
      s"pipe WHERE did not push to the scan: $pushed")
    // and the chain resolves to the same OPTIMIZED plan as classic SQL
    graft.util.Tables.table(spark, sf0001, "lineitem")
      .createOrReplaceTempView("g_lineitem_b74")
    val classic = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM g_lineitem_b74
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")
    assert(piped.collect().toSeq == classic.collect().toSeq)
  }

  test("c67: scores match a from-scratch BM25 replay; top-k is TakeOrdered") {
    import spark.implicits._
    val got = q("c67_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // independent replay in driver code (scala collections, no Spark)
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val tok = docs.flatMap { case (id, t) => t.split(" ").map((id, _)) }
    val dl = tok.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val stot = tok.length.toLong
    val a10k = math.max(1L, 10000L * stot / math.max(1L, n))
    val dfm = tok.distinct.groupBy(_._2).view.mapValues(_.length.toLong)
    val terms = dfm.toSeq.sortBy { case (w, df) => (-df, w) }
      .slice(10, 13).toMap
    def bits(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val scored = tok.filter(t => terms.contains(t._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((id, w), tf) =>
        val idf = bits(n / terms(w))
        (id, (idf * 220000000L * tf) /
          (10000L * tf + 3000L + (90000000L * dl(id)) / a10k))
      }
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toSeq
      .map { case (id, (nh, sc)) => (id, nh, sc) }
      .sortBy { case (id, _, sc) => (-sc, id) }.take(10)
    assert(got == scored, s"got=$got\nexp=$scored")
    assert(got.nonEmpty && got.forall(_._2 >= 1))
    // the ranking is a TakeOrdered top-k, never a global sort
    val plan = q("c67_bm25").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "c67 top-10 should plan as TakeOrderedAndProject")
  }

  test("b78: rebalance plans the AQE-sized exchange; sink files are sane") {
    // the hinted fragment really plans RebalancePartitions →
    // REBALANCE_PARTITIONS_BY_COL (the AQE split-and-coalesce shape)
    val frag = graft.util.Tables.table(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
      .hint("rebalance", col("l_returnflag"))
    assert(frag.queryExecution.optimizedPlan.toString
      .contains("RebalancePartitions"))
    frag.count()
    assert(frag.queryExecution.executedPlan.toString
      .contains("REBALANCE_PARTITIONS_BY_COL"))
    // and the declared query's content equals the un-rebalanced agg
    val got = q("b78_hint_rebalance").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = graft.util.Tables.table(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("s"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("c68: NFC collapses the two canonical forms; raw bytes split them") {
    val rows = q("c68_dedup_nfc").collect()
    assert(rows.nonEmpty)
    // every doc must show EXACTLY two raw forms folding to one
    // normalized fingerprint — n_raw == 1 would mean the two source
    // literals silently collapsed to the same byte sequence (an editor
    // or tool re-normalizing the .scala/SQL text), which is the
    // failure mode the escape-sequence literals exist to prevent
    rows.foreach { r =>
      assert(r.getAs[Long]("n_raw") == 2L,
        s"doc ${r.getLong(0)}: raw forms collapsed — NFC demo is vacuous")
      assert(r.getAs[Long]("n_norm") == 1L,
        s"doc ${r.getLong(0)}: NFC failed to unify the canonical forms")
    }
    // and the kernel agrees byte-for-byte with java.text.Normalizer on
    // the precomposed form (norm_fp is md5 of the NFC string)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.take(5).foreach { r =>
      val expect = java.text.Normalizer.normalize(
        "café " + docs(r.getLong(0)), java.text.Normalizer.Form.NFC)
      val fp = md.digest(expect.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("norm_fp") == fp)
    }
  }
}
