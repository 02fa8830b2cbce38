package graft.sources

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSpec

/** The commit-retry loop over the catalog's conflict detection: a
  * stale operation re-runs from a fresh snapshot and lands; two real
  * concurrent MERGEs racing on one table both land through retry and
  * converge to the commuted final state.
  */
class GraftMemRetrySpec extends SparkSpec {

  private def freshCow(name: String): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT)")
    tbl
  }

  test("a genuinely stale row-level operation conflicts, then lands " +
      "on retry from a fresh snapshot") {
    val tbl = freshCow("spec_retry_stale")
    spark.range(10).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append()
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_retry_stale"))
      .asInstanceOf[GraftMemTable]
    var attempts = 0
    // the COMPLETE operation re-runs per attempt: scan (pins the
    // snapshot version) → recompute the rewrite from the CURRENT
    // table → commit. Attempt 1 has a commit interleaved after its
    // scan — a real conflict; attempt 2 re-scans fresh and lands.
    GraftMemRetry.retryOnConflict(3) {
      attempts += 1
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.DELETE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build()
      op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()
      if (attempts == 1)
        spark.sql(s"UPDATE $tbl SET bal = bal + 7 WHERE key = 0")
      val keep = spark.sql(s"SELECT key, bal FROM $tbl WHERE key >= 5")
        .collect()
      val bw = op.newWriteBuilder(
        new org.apache.spark.sql.connector.write.LogicalWriteInfo {
          override def queryId(): String = "spec"
          override def schema() = table.schema()
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().toBatch
      val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
      keep.foreach(r => w.write(org.apache.spark.sql.catalyst
        .InternalRow(r.getLong(0), r.getLong(1))))
      bw.commit(Array(w.commit()))
    }
    assert(attempts == 2)
    val got = spark.sql(s"SELECT key, bal FROM $tbl ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (5L until 10L).map(k => (k, k)))
  }

  test("wrapped conflicts (cause chain) are retried; non-conflicts " +
      "propagate immediately") {
    var n = 0
    val out = GraftMemRetry.retryOnConflict(2) {
      n += 1
      if (n == 1)
        throw new RuntimeException("task failed",
          new GraftMemCommitConflictException("inner"))
      42
    }
    assert(out == 42 && n == 2)
    var m = 0
    intercept[IllegalArgumentException] {
      GraftMemRetry.retryOnConflict(5) {
        m += 1
        throw new IllegalArgumentException("not a conflict")
      }
    }
    assert(m == 1, "non-conflict must not be retried")
    val exhausted = intercept[GraftMemCommitConflictException] {
      GraftMemRetry.retryOnConflict(2) {
        throw new GraftMemCommitConflictException("always")
      }
    }
    assert(exhausted.getMessage.contains("persisted through 2 attempts"))
  }

  test("convergence fuzz: racing additive MERGEs through retry equal " +
      "the serial replay on every flavor — a lost update cannot hide") {
    // Additive increments commute, so whatever interleaving the race
    // takes, the final state is the deterministic serial replay. If
    // conflict DETECTION had a hole (a stale rewrite landing), the
    // lost increments would show as a sum mismatch; if RETRY had a
    // liveness hole, a racer would exhaust and fail the errs check.
    for (flavor <- Seq("cow", "cow_partitioned", "mor")) {
      spark.conf.set("spark.sql.catalog.graftmem",
        "graft.sources.GraftMemCatalog")
      val tbl = s"graftmem.db.spec_retry_fuzz_$flavor"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, bal BIGINT)" +
        (flavor match {
          case "cow_partitioned" => " PARTITIONED BY (g)"
          case "mor" =>
            " TBLPROPERTIES ('graft.row_level' = 'merge-on-read')"
          case _ => ""
        }))
      spark.range(16)
        .selectExpr("id AS key", "id % 4 AS g", "id AS bal")
        .writeTo(tbl).append()
      // per racer: (key-mod selector, increment) — overlapping key
      // sets across racers, so same-row conflicts genuinely occur
      val plans = Seq(
        Seq((2L, 10L), (3L, 100L)),
        Seq((2L, 1000L), (4L, 10000L)))
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val ts = plans.map { steps =>
        val t = new Thread(() =>
          try {
            start.await(10, TimeUnit.SECONDS)
            steps.foreach { case (m, add) =>
              GraftMemRetry.retryOnConflict(12) {
                spark.sql(
                  s"""MERGE INTO $tbl t
                     |USING (SELECT key FROM $tbl WHERE key % $m = 0)
                     |  b ON t.key = b.key
                     |WHEN MATCHED THEN UPDATE SET bal = bal + $add
                     |""".stripMargin)
              }
            }
          } catch { case e: Throwable => errs.add(e) })
        t.start(); t
      }
      start.countDown()
      ts.foreach(_.join(180000))
      assert(errs.isEmpty, s"$flavor racer failed: ${errs.peek()}")
      val got = spark.sql(s"SELECT key, bal FROM $tbl ORDER BY key")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = (0L until 16L).map { k =>
        val inc = plans.flatten.collect {
          case (m, add) if k % m == 0 => add
        }.sum
        (k, k + inc)
      }
      assert(got == want, s"flavor=$flavor diverged from serial replay")
    }
  }

  test("maintenance races writers: MERGEs with retry vs concurrent " +
      "compaction and snapshot expiry converge on the MoR table") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = "graftmem.db.spec_retry_maint"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(12).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append()
    val start = new CountDownLatch(1)
    val stopMaint = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    // writer: 4 additive increment rounds, each retried on conflict
    val writer = new Thread(() =>
      try {
        start.await(10, TimeUnit.SECONDS)
        (1 to 4).foreach { i =>
          GraftMemRetry.retryOnConflict(15) {
            spark.sql(
              s"""MERGE INTO $tbl t
                 |USING (SELECT key FROM $tbl WHERE key % 2 = ${i % 2})
                 |  b ON t.key = b.key
                 |WHEN MATCHED THEN UPDATE SET bal = bal + ${i * 100}
                 |""".stripMargin)
          }
        }
      } catch { case e: Throwable => errs.add(e) }
      finally stopMaint.set(true))
    // maintenance: compact + expire in a loop until the writer is done
    val maint = new Thread(() =>
      try {
        start.await(10, TimeUnit.SECONDS)
        while (!stopMaint.get()) {
          spark.sql(
            s"CALL graftmem.system.compact('db.spec_retry_maint')")
            .collect()
          spark.sql("CALL graftmem.system.expire_snapshots(" +
            "'db.spec_retry_maint', 2)").collect()
          Thread.sleep(20)
        }
      } catch { case e: Throwable => errs.add(e) })
    writer.start(); maint.start(); start.countDown()
    writer.join(240000); maint.join(240000)
    assert(errs.isEmpty, s"racer failed: ${errs.peek()}")
    // increments commute and maintenance is content-invariant, so the
    // final state is the serial replay regardless of interleaving
    val got = spark.sql(s"SELECT key, bal FROM $tbl ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 12L).map { k =>
      val inc = (1 to 4).map(i => if (k % 2 == i % 2) i * 100L else 0L).sum
      (k, k + inc)
    }
    assert(got == want,
      s"maintenance race corrupted the table:\n$got\nvs\n$want")
  }

  test("two concurrent MERGEs on one table both land through retry " +
      "and converge to the commuted state") {
    val tbl = freshCow("spec_retry_race")
    spark.range(20).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append()
    // disjoint key sets — the updates commute, so the final state is
    // deterministic whichever order the race resolves in; on an
    // UNPARTITIONED CoW table the loser still always conflicts (any
    // interleaved commit invalidates its full-table rewrite), so at
    // least one retry is exercised whenever the race interleaves.
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def racer(whereMod: Int, add: Long): Thread = {
      val t = new Thread(() =>
        try {
          start.await(10, TimeUnit.SECONDS)
          GraftMemRetry.retryOnConflict(8) {
            spark.sql(
              s"""MERGE INTO $tbl t
                 |USING (SELECT key FROM $tbl WHERE key % 2 = $whereMod)
                 |  b ON t.key = b.key
                 |WHEN MATCHED THEN UPDATE SET bal = bal + $add
                 |""".stripMargin)
          }
        } catch { case e: Throwable => errs.add(e) })
      t.start(); t
    }
    val a = racer(0, 1000L)
    val b = racer(1, 100000L)
    start.countDown()
    a.join(120000); b.join(120000)
    assert(errs.isEmpty, s"racer failed: ${errs.peek()}")
    val got = spark.sql(
      s"SELECT key, bal FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 20L).map(k =>
      (k, k + (if (k % 2 == 0) 1000L else 100000L)))
    assert(got == want)
  }
}
