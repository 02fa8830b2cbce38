package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The row-level-operation catalog behind b75: MERGE / UPDATE / DELETE
  * all route through the group-based ReplaceData machinery, and the
  * `_group` metadata column contract that makes Spark project data
  * rows before they reach the writer.
  */
class GraftMemCatalogSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal_cents BIGINT)")
    tbl
  }

  test("MERGE INTO: update/delete/insert arms all land; plan is ReplaceData") {
    val tbl = freshTable("spec_merge")
    spark.range(10).selectExpr("id AS key", "id * 100 AS bal_cents")
      .writeTo(tbl).append()
    spark.range(5, 15).selectExpr("id AS key", "id * 1000 AS nb")
      .createOrReplaceTempView("spec_batch")
    val m = spark.sql(
      s"""MERGE INTO $tbl t USING spec_batch b ON t.key = b.key
         |WHEN MATCHED AND b.key % 2 = 0 THEN UPDATE SET bal_cents = b.nb
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (key, bal_cents)
         |  VALUES (b.key, b.nb)""".stripMargin)
    assert(m.queryExecution.executedPlan.toString.contains("ReplaceData"),
      "MERGE must plan through the group-based ReplaceData write")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect =
      (0L to 4L).map(k => (k, k * 100)) ++          // untouched
        Seq((6L, 6000L), (8L, 8000L)) ++            // updated (5,7,9 deleted)
        (10L to 14L).map(k => (k, k * 1000))        // inserted
    assert(got == expect)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: retire + stamp land in ONE " +
      "ReplaceData commit, clause order respected (b100)") {
    val tbl = freshTable("spec_nmbs")
    spark.range(10).selectExpr("id AS key", "id * 100 AS bal_cents")
      .writeTo(tbl).append()
    // source covers keys 0–4 plus fresh keys 20–21; keys 5–9 are
    // NOT MATCHED BY SOURCE: odd ones retire, even ones stamp +1
    spark.range(5).selectExpr("id AS key", "id * 1000 AS nb")
      .union(spark.range(20, 22).selectExpr("id", "id * 1000"))
      .createOrReplaceTempView("spec_nmbs_src")
    val vBefore = {
      val t = GraftMemCatalog.lookup(tbl.stripPrefix("graftmem."))
        .asInstanceOf[GraftMemTable]
      t.synchronized(t.commitVersion)
    }
    val m = spark.sql(
      s"""MERGE INTO $tbl t USING spec_nmbs_src b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET bal_cents = b.nb
         |WHEN NOT MATCHED THEN INSERT (key, bal_cents)
         |  VALUES (b.key, b.nb)
         |WHEN NOT MATCHED BY SOURCE AND t.key % 2 = 1 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE
         |  SET bal_cents = bal_cents + 1""".stripMargin)
    // the clause is pure plan surface: the SAME group-replacing
    // ReplaceData write as b75, no delta/two-pass fallback
    assert(m.queryExecution.executedPlan.toString.contains("ReplaceData"),
      "NOT MATCHED BY SOURCE must execute through ReplaceData")
    val t = GraftMemCatalog.lookup(tbl.stripPrefix("graftmem."))
      .asInstanceOf[GraftMemTable]
    assert(t.synchronized(t.commitVersion) == vBefore + 1,
      "the full sync (upserts + retire + stamp) must be ONE commit")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect =
      (0L to 4L).map(k => (k, k * 1000)) ++       // matched update
        Seq((6L, 601L), (8L, 801L)) ++            // stamped (5,7,9 retired)
        Seq((20L, 20000L), (21L, 21000L))         // inserted
    assert(got == expect)
  }

  test("UPDATE and DELETE route through the same row-level machinery") {
    val tbl = freshTable("spec_ud")
    spark.range(6).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).append()
    spark.sql(s"UPDATE $tbl SET bal_cents = bal_cents + 100 WHERE key < 2")
    spark.sql(s"DELETE FROM $tbl WHERE key = 5")
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 100L), (1L, 101L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("_group metadata column is queryable and constant") {
    val tbl = freshTable("spec_meta")
    spark.range(3).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).append()
    val g = spark.sql(s"SELECT key, _group FROM $tbl ORDER BY key").collect()
    assert(g.map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L),
      "the single rewrite group reports _group = 0 on every row")
  }

  test("b77: group-pruned merge — untouched groups keep their row OBJECTS") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_gp")
    spark.sql("CREATE TABLE graftmem.db.spec_gp " +
      "(key BIGINT, g BIGINT, bal BIGINT) PARTITIONED BY (g)")
    spark.range(40).selectExpr("id AS key", "id % 4 AS g", "id * 10 AS bal")
      .writeTo("graftmem.db.spec_gp").append()
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_gp"))
      .asInstanceOf[graft.sources.GraftMemTable]
    // identity map of the UNTOUCHED groups' row instances, pre-merge
    val before = table.rows.filter(_._1 != 1L).map(_._2)
      .map(r => System.identityHashCode(r) -> r).toMap
    spark.range(10).selectExpr("id * 4 + 1 AS key", "id * 1000 AS nb")
      .createOrReplaceTempView("spec_gp_batch")
    val m = spark.sql(
      """MERGE INTO graftmem.db.spec_gp t USING spec_gp_batch b
        |ON t.key = b.key
        |WHEN MATCHED THEN UPDATE SET bal = b.nb""".stripMargin)
    // the op scan carried the runtime group filter…
    assert(m.queryExecution.executedPlan.toString
      .contains("dynamicpruning"),
      "no runtime group filter on the row-level scan")
    // …and the commit replaced ONLY group 1: every untouched-group row
    // is the SAME object as before (copy-on-write narrowing — nothing
    // was recomputed or rewritten for groups 0/2/3)
    val after = table.rows.filter(_._1 != 1L).map(_._2)
    assert(after.size == 30)
    assert(after.forall(r => before.get(System.identityHashCode(r))
      .exists(_ eq r)),
      "untouched groups were rewritten — group pruning did not narrow " +
        "the commit")
    // values: group 1 updated, everything else intact, count preserved
    val got = spark.table("graftmem.db.spec_gp").orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val expect = (0L until 40L).map { k =>
      (k, if (k % 4 == 1) (k / 4) * 1000 else k * 10)
    }
    assert(got == expect)
  }

  test("d23: streaming commit is idempotent per (queryId, epoch)") {
    val tbl = freshTable("spec_stream")
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_stream"))
      .asInstanceOf[graft.sources.GraftMemTable]
    def info(qid: String) =
      new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = qid
        override def schema(): org.apache.spark.sql.types.StructType =
          table.schema()
        override def options()
            : org.apache.spark.sql.util.CaseInsensitiveStringMap =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }
    def writeEpoch(qid: String, epoch: Long, base: Long): Unit = {
      val sw = table.newWriteBuilder(info(qid)).build().toStreaming
      val w = sw.createStreamingWriterFactory(null).createWriter(0, 0L, epoch)
      (0 until 3).foreach { i =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(base + i, base + i))
      }
      sw.commit(epoch, Array(w.commit()))
    }
    writeEpoch("q1", 0L, 0L)
    assert(spark.table(tbl).count() == 3)
    // the replayed epoch (restart re-commit) must be a no-op…
    writeEpoch("q1", 0L, 100L)
    assert(spark.table(tbl).count() == 3,
      "a re-committed epoch doubled rows — exactly-once broken")
    // …while the same epoch number from a DIFFERENT query appends
    writeEpoch("q2", 0L, 200L)
    assert(spark.table(tbl).count() == 6)
  }

  test("b76: catalog function binds its magic method; equals the native Expression") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val df = graft.SparkEntry.queries("b76_function_catalog")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CosineSimV2") && plan.contains("invoke"),
      s"magic method did not bind as a direct invoke:\n$plan")
    assert(!plan.toLowerCase.contains("udf"))
    // bit-identical to the native codegen'd Expression (c17): shared
    // kernel, same join shape, same rounding
    val c17 = graft.SparkEntry.queries("c17_similarity_native_expr")(
      spark, sf0001)
    assert(df.collect().toSeq == c17.collect().toSeq)
    // a wrong-typed call fails at BIND time, loudly
    spark.range(1).selectExpr("id").createOrReplaceTempView("b76_bad")
    val err = intercept[Exception] {
      spark.sql("SELECT graftmem.db.cosine_sim(id, id) FROM b76_bad")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("b79: catalog aggregate partial-aggregates and equals the native sketch") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val df = graft.SparkEntry.queries("b79_catalog_aggregate")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // distributed partial aggregation, not a single-node fold
    assert(plan.contains("partial_v2aggregator") &&
      plan.contains("merge_v2aggregator"),
      s"V2 aggregate did not partial-aggregate:\n$plan")
    // bit-identical to the native TypedImperativeAggregate (b33):
    // shared hash family + estimator
    val b33 = graft.SparkEntry.queries("b33_agg_kmv_sketch")(spark, sf0001)
    assert(df.collect().toSeq == b33.collect().toSeq)
    // wrong-typed call fails at bind time
    val err = intercept[Exception] {
      spark.sql("SELECT graftmem.db.kmv_distinct('x')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("kmv_distinct"))
  }

  test("merge fuzz: generated CDC batches equal a driver replay " +
      "(all three layouts)") {
    // the riskiest new code paths: MERGE through ReplaceData with and
    // without group pruning AND through WriteDelta (merge-on-read),
    // against generated update/delete/insert mixes — including empty
    // batches, all-delete batches, inserts into brand-new groups, and
    // single-row tables. MoR runs additionally fuzz COMPACTION
    // invariance (CALL compact must not change visible content).
    val gen = for {
      n <- org.scalacheck.Gen.choose(1, 30)
      ops <- org.scalacheck.Gen.listOfN(40, org.scalacheck.Gen.choose(0, 3))
      layout <- org.scalacheck.Gen.oneOf("cow", "cow_partitioned", "mor")
    } yield (n, ops, layout)
    var i = 0
    forAllN(gen, 10) { case (n, ops, layout) =>
      i += 1
      spark.conf.set("spark.sql.catalog.graftmem",
        "graft.sources.GraftMemCatalog")
      val tbl = s"graftmem.db.fuzz_m$i"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, bal BIGINT)" +
        (layout match {
          case "cow_partitioned" => " PARTITIONED BY (g)"
          case "mor" =>
            " TBLPROPERTIES ('graft.row_level' = 'merge-on-read')"
          case _ => ""
        }))
      val init = (0L until n.toLong).map(k => (k, k % 3, k * 10))
      import spark.implicits._
      init.toDF("key", "g", "bal").writeTo(tbl).append()
      // batch: op per key in [0, 40): 0 = absent, 1 = update, 2 =
      // delete, 3 = insert-if-absent (new group 7 for inserts)
      val batch = ops.zipWithIndex.collect {
        case (1, k) => (k.toLong, "U", k * 100L)
        case (2, k) => (k.toLong, "D", 0L)
        case (3, k) => (k.toLong, "I", k * 1000L)
      }
      batch.toDF("key", "op", "nb").createOrReplaceTempView("fuzz_batch")
      spark.sql(
        s"""MERGE INTO $tbl t USING fuzz_batch b ON t.key = b.key
           |WHEN MATCHED AND b.op = 'U' THEN UPDATE SET bal = b.nb
           |WHEN MATCHED AND b.op = 'D' THEN DELETE
           |WHEN NOT MATCHED AND b.op = 'I' THEN
           |  INSERT (key, g, bal) VALUES (b.key, 7, b.nb)""".stripMargin)
      def snap() = spark.table(tbl).orderBy("key").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val got = snap()
      // driver replay of the same semantics
      val bmap = batch.map(b => b._1 -> b).toMap
      val kept = init.flatMap { case (k, g, bal) =>
        bmap.get(k) match {
          case Some((_, "U", nb)) => Some((k, g, nb))
          case Some((_, "D", _))  => None
          case _                  => Some((k, g, bal))
        }
      }
      val inserted = batch.collect {
        case (k, "I", nb) if k >= n => (k, 7L, nb)
      }
      val expect = (kept ++ inserted).sortBy(_._1)
      assert(got == expect,
        s"n=$n layout=$layout\ngot=$got\nexp=$expect")
      // time travel (b84) over the same generated history: v1 must
      // still read the initial append and v2 the post-merge state, on
      // every layout (ReplaceData full, ReplaceData group-pruned,
      // WriteDelta) — including empty/all-delete batches, where the
      // merge's commit is a content-identical new version
      def snapV(v: Long) = spark.sql(
        s"SELECT key, g, bal FROM $tbl VERSION AS OF $v ORDER BY key")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(snapV(1) == init.sortBy(_._1),
        s"v1 snapshot drifted (n=$n layout=$layout)")
      assert(snapV(2) == expect,
        s"v2 snapshot != current post-merge state (n=$n layout=$layout)")
      var cur = expect
      if (layout == "mor") {
        // compaction is invisible: same content, delta log folded away
        spark.sql(s"CALL graftmem.system.compact('db.fuzz_m$i')").collect()
        assert(snap() == expect, s"compaction changed content (n=$n)")
        // …and invisible to HISTORY too: the maintenance version (v3)
        // reads identically, and pre-compaction snapshots survive the
        // fold (their refs pin the pre-compaction structures)
        assert(snapV(3) == expect,
          s"compaction version changed visible content (n=$n)")
        assert(snapV(1) == init.sortBy(_._1),
          s"compaction destroyed the v1 snapshot (n=$n)")
        // the MoR flavor refuses overwrite faces loudly (its write
        // model is delta-append + compaction, never group swaps)
        val err = intercept[Exception] {
          spark.range(1)
            .selectExpr("id + 5000 AS key", "CAST(0 AS BIGINT) AS g",
              "id AS bal")
            .writeTo(tbl).overwritePartitions()
        }
        assert(err.getMessage.contains("dynamic overwrite"),
          err.getMessage)
      } else {
        // dynamic partition overwrite (b86) over the post-merge state:
        // re-load a generated subset of groups; replay = drop those
        // groups' rows, add the reloads; untouched rows keep identity
        val owSel = Seq(0L, 1L, 2L, 7L)
          .filter(g => (n + ops.sum + g) % 2 == 0) // generator-derived
        if (owSel.nonEmpty) {
          owSel.map(g => (5000L + g, g, 9000L + g))
            .toDF("key", "g", "bal").writeTo(tbl).overwritePartitions()
          val owExpect = (expect.filterNot(r => owSel.contains(r._2)) ++
            owSel.map(g => (5000L + g, g, 9000L + g))).sortBy(_._1)
          assert(snap() == owExpect,
            s"overwrite diverged (n=$n layout=$layout sel=$owSel)")
          // the overwrite is version 3; v2 still reads the pre-
          // overwrite state
          assert(snapV(3) == owExpect,
            s"v3 snapshot != post-overwrite state (n=$n)")
          assert(snapV(2) == expect,
            s"overwrite mutated the v2 snapshot (n=$n)")
          cur = owExpect
        }
      }
      // SCHEMA EVOLUTION under the same generated history (half the
      // runs, generator-derived): ALTER adds a column at the end of
      // whatever history ran; live reads pad every pre-ALTER row
      // with the default 0, and the v2 (post-merge) snapshot keeps
      // the pre-ALTER 3-column schema
      if ((n + ops.count(_ == 1)) % 2 == 0) {
        spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (extra BIGINT)")
        val widened = spark.sql(
          s"SELECT key, g, bal, extra FROM $tbl ORDER BY key")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSeq
        assert(widened == cur.map(t => (t._1, t._2, t._3, 0L)),
          s"post-ALTER read diverged (n=$n layout=$layout)")
        val v2schema = spark.sql(
          s"SELECT * FROM $tbl VERSION AS OF 2").schema.fieldNames.toSeq
        assert(v2schema == Seq("key", "g", "bal"),
          s"pre-ALTER snapshot gained the new column (n=$n)")
      }
    }
  }

  test("a40: write_layout table demands and receives cluster+sort; " +
      "the connector's own checks catch violations") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_clust")
    spark.sql("CREATE TABLE graftmem.db.spec_clust (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.write_layout' = 'k,v')")
    // a deliberately scrambled frame: the ENGINE must insert the
    // exchange + sort, and the writers verify row-by-row — success of
    // this append IS the proof the layout arrived
    spark.range(1000)
      .selectExpr("id % 7 AS k", "(999 - id) AS v")
      .repartition(8)
      .writeTo("graftmem.db.spec_clust").append()
    val got = spark.table("graftmem.db.spec_clust")
      .groupBy("k").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got.map(_._2).sum == 1000 && got.size == 7)
    // negative: the validating writer itself rejects out-of-order rows
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_clust"))
      .asInstanceOf[GraftMemTable]
    val w = new GraftMemWriterFactory(Array(0, 1),
      Array(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.LongType),
      Array(java.lang.Long.valueOf(0L), java.lang.Long.valueOf(0L)),
      Array(0, 1))
      .createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(5L, 10L))
    val err = intercept[IllegalStateException] {
      w.write(org.apache.spark.sql.catalyst.InternalRow(5L, 9L))
    }
    assert(err.getMessage.contains("ordering violated"))
    // …and the commit rejects a cluster value split across two tasks
    val bw = table.newWriteBuilder(
      new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = "spec-a40"
        override def schema(): org.apache.spark.sql.types.StructType =
          table.schema()
        override def options()
            : org.apache.spark.sql.util.CaseInsensitiveStringMap =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }).build().toBatch
    val m1 = GraftMemCommit(Vector(Array(1L, 1L)), Set(1L))
    val m2 = GraftMemCommit(Vector(Array(1L, 2L)), Set(1L))
    val err2 = intercept[IllegalStateException] {
      bw.commit(Array(m1, m2))
    }
    assert(err2.getMessage.contains("clustered"))
  }

  test("b104: rollback restores rows AND schema as a new commit; " +
      "history is preserved; the swap is zero-copy") {
    val tbl = freshTable("spec_rollback")
    spark.range(10).selectExpr("id AS key", "id * 100 AS bal_cents")
      .writeTo(tbl).append() // v1: the good state
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (extra BIGINT DEFAULT 9)") // v2
    spark.range(50, 55)
      .selectExpr("id AS key", "id AS bal_cents", "id AS extra")
      .writeTo(tbl).append() // v3: the bad batch
    val out = spark.sql(
      s"CALL graftmem.system.rollback('db.spec_rollback', 1)").collect()
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 10L &&
      out.head.getLong(2) == 4L) // restored v1, 10 rows, now at v4
    // current state == v1: 2 columns, 10 rows
    assert(spark.table(tbl).schema.fieldNames.toSeq ==
      Seq("key", "bal_cents"))
    assert(spark.table(tbl).count() == 10)
    // history preserved: the bad state is still time-travelable with
    // its OWN (3-column) shape
    val bad = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 3")
    assert(bad.schema.fieldNames.toSeq == Seq("key", "bal_cents", "extra"))
    assert(bad.count() == 15)
    // the restore is a version in __history, not an erasure
    val hist = spark.table(s"${tbl}__history")
      .select("version", "live_rows", "is_current").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(hist.last == ((4L, 10L, true)))
    // zero-copy: the live vector IS the v1 snapshot's vector
    val g = GraftMemCatalog.lookup("db.spec_rollback")
      .asInstanceOf[GraftMemTable]
    g.synchronized {
      assert(g.rows eq g.snapshots(1L)._1,
        "rollback must swap the snapshot vector in by reference")
    }
  }

  test("b104: rollback refuses expired versions, the current version, " +
      "merge-on-read, and crossing partition evolution") {
    val tbl = freshTable("spec_rbguard")
    spark.range(5).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).append() // v1
    spark.range(5, 9).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).append() // v2
    val atHead = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graftmem.system.rollback('db.spec_rbguard', 2)")
        .collect()
    }
    assert(atHead.getMessage.contains("already at version"))
    spark.sql(
      "CALL graftmem.system.expire_snapshots('db.spec_rbguard', 1)")
      .collect()
    val expired = intercept[IllegalArgumentException] {
      spark.sql(s"CALL graftmem.system.rollback('db.spec_rbguard', 1)")
        .collect()
    }
    assert(expired.getMessage.contains("unrecoverable"))
    // merge-on-read declines
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_rbmor")
    spark.sql("CREATE TABLE graftmem.db.spec_rbmor " +
      "(key BIGINT, bal_cents BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(3).selectExpr("id AS key", "id AS bal_cents")
      .writeTo("graftmem.db.spec_rbmor").append()
    val mor = intercept[UnsupportedOperationException] {
      spark.sql("CALL graftmem.system.rollback('db.spec_rbmor', 0)")
        .collect()
    }
    assert(mor.getMessage.contains("copy-on-write"))
    // crossing partition evolution declines: pre-evolution snapshots
    // tag rows under the old spec
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_rbpevol")
    spark.sql("CREATE TABLE graftmem.db.spec_rbpevol " +
      "(key BIGINT, g BIGINT)")
    spark.range(6).selectExpr("id AS key", "id % 3 AS g")
      .writeTo("graftmem.db.spec_rbpevol").append() // v1
    spark.sql(
      "CALL graftmem.system.set_partition('db.spec_rbpevol', 'g')")
      .collect() // v2
    spark.range(6, 9).selectExpr("id AS key", "id % 3 AS g")
      .writeTo("graftmem.db.spec_rbpevol").append() // v3
    val across = intercept[UnsupportedOperationException] {
      spark.sql("CALL graftmem.system.rollback('db.spec_rbpevol', 1)")
        .collect()
    }
    assert(across.getMessage.contains("partition spec evolved"))
    // rolling back to AT or AFTER the evolution commit is fine
    spark.sql("CALL graftmem.system.rollback('db.spec_rbpevol', 2)")
      .collect()
    assert(spark.table("graftmem.db.spec_rbpevol").count() == 6)
  }

  test("b105: clone shares row objects (zero-copy) and the histories " +
      "diverge independently; duplicate names reject loudly") {
    val src = freshTable("spec_clsrc")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_cldst")
    spark.range(10).selectExpr("id AS key", "id * 10 AS bal_cents")
      .writeTo(src).append() // src v1
    val out = spark.sql("CALL graftmem.system.clone_table(" +
      "'db.spec_clsrc', 'db.spec_cldst')").collect()
    assert(out.head.getLong(0) == 10L && out.head.getLong(1) == 1L)
    val gs = GraftMemCatalog.lookup("db.spec_clsrc")
      .asInstanceOf[GraftMemTable]
    val gd = GraftMemCatalog.lookup("db.spec_cldst")
      .asInstanceOf[GraftMemTable]
    // zero-copy at clone time: the clone's vector IS the source's
    gs.synchronized { gd.synchronized {
      assert(gd.rows eq gs.rows,
        "clone_table must share the source's row vector by reference")
    } }
    // diverge both ways
    spark.range(100, 103).selectExpr("id AS key", "id AS bal_cents")
      .writeTo("graftmem.db.spec_cldst").append()
    spark.sql(s"DELETE FROM $src WHERE key % 2 = 0")
    assert(spark.table(src).count() == 5) // deletes invisible to clone
    assert(spark.table("graftmem.db.spec_cldst").count() == 13)
    // the clone's pre-divergence rows still ARE the source's v1
    // snapshot objects (src's own DELETE rewrote ITS live arrays —
    // copy-on-write — but the shared originals are untouched)
    gs.synchronized { gd.synchronized {
      val v1 = gs.snapshots(1L)._1.map(_._2).toSet
      assert(gd.rows.map(_._2).count(v1.contains) == 10,
        "the clone's undiverged rows must remain the source snapshot's " +
          "row objects")
    } }
    // a clone into an existing name is loud
    intercept[org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException] {
      spark.sql("CALL graftmem.system.clone_table(" +
        "'db.spec_clsrc', 'db.spec_cldst')").collect()
    }
  }

  test("b105: a VERSIONED clone serves the snapshot's own shape — " +
      "pre-evolution schema, pre-divergence content") {
    val src = freshTable("spec_clver")
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_clver_v1")
    spark.range(5).selectExpr("id AS key", "id * 10 AS bal_cents")
      .writeTo(src).append() // v1: 2 columns, 5 rows
    spark.sql(s"ALTER TABLE $src ADD COLUMNS (extra BIGINT DEFAULT 3)") // v2
    spark.range(5, 8)
      .selectExpr("id AS key", "id AS bal_cents", "id AS extra")
      .writeTo(src).append() // v3: 3 columns, 8 rows
    val out = spark.sql("CALL graftmem.system.clone_table(" +
      "'db.spec_clver', 'db.spec_clver_v1', 1)").collect()
    assert(out.head.getLong(0) == 5L && out.head.getLong(1) == 1L)
    val c = spark.table("graftmem.db.spec_clver_v1")
    assert(c.schema.fieldNames.toSeq == Seq("key", "bal_cents"),
      "a versioned clone must carry the snapshot's OWN schema")
    assert(c.count() == 5)
    // an expired / unknown version is loud
    val bad = intercept[IllegalArgumentException] {
      spark.sql("CALL graftmem.system.clone_table(" +
        "'db.spec_clver', 'db.spec_clver_v9', 99)").collect()
    }
    assert(bad.getMessage.contains("no retained snapshot"))
  }

  test("b106: MERGE WITH SCHEMA EVOLUTION evolves the target " +
      "mid-statement; without the clause drift never evolves") {
    val tbl = freshTable("spec_mevol")
    spark.range(4).selectExpr("id AS key", "id * 100 AS bal_cents")
      .writeTo(tbl).append() // v1
    spark.range(2, 6)
      .selectExpr("id AS key", "id * 1000 AS bal_cents", "id % 2 AS seg")
      .createOrReplaceTempView("spec_mevol_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
         |USING spec_mevol_src b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table(tbl).schema.fieldNames.toSeq ==
      Seq("key", "bal_cents", "seg"))
    val got = spark.table(tbl).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // untouched rows (0, 1) pad seg with the typed default 0;
    // matched (2, 3) and inserted (4, 5) take the source's values
    assert(got == Seq((0L, 0L, 0L), (1L, 100L, 0L), (2L, 2000L, 0L),
      (3L, 3000L, 1L), (4L, 4000L, 0L), (5L, 5000L, 1L)))
    // the evolution DDL is its own commit (v2) before the rewrite
    // (v3): the pre-merge version still serves the pre-drift shape
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
      .schema.fieldNames.toSeq == Seq("key", "bal_cents"))
    // WITHOUT the clause the same statement must not evolve anything
    val tbl2 = freshTable("spec_mevol2")
    spark.range(4).selectExpr("id AS key", "id * 100 AS bal_cents")
      .writeTo(tbl2).append()
    spark.sql(
      s"""MERGE INTO $tbl2 t USING spec_mevol_src b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table(tbl2).schema.fieldNames.toSeq ==
      Seq("key", "bal_cents"),
      "a plain MERGE must never evolve the target silently")
  }

  test("rollback fuzz: random append/delete/rollback sequences equal " +
      "a driver-side replay model at EVERY version, head and history") {
    import spark.implicits._
    val tbl = freshTable("spec_rbfuzz")
    val rnd = new scala.util.Random(13)
    // model(v) = the key->bal map committed as version v
    var model = Vector(Map.empty[Long, Long])
    var nextKey = 0L
    for (_ <- 1 to 24) {
      rnd.nextInt(4) match {
        case 0 | 1 => // append 1..12 fresh keys
          val n = rnd.nextInt(12) + 1
          val rows = (0 until n).map(i => (nextKey + i, (nextKey + i) * 7))
          nextKey += n
          rows.toDF("key", "bal_cents").coalesce(1).writeTo(tbl).append()
          model :+= model.last ++ rows.toMap
        case 2 => // delete a residue class (a commit even when empty —
          // the DELETE statement committed, like an empty rewrite)
          val r = rnd.nextInt(5)
          spark.sql(s"DELETE FROM $tbl WHERE key % 5 = $r")
          model :+= model.last.filterNot(_._1 % 5 == r)
        case _ if model.length > 1 => // rollback to a random past version
          val v = rnd.nextInt(model.length - 1)
          spark.sql(
            s"CALL graftmem.system.rollback('db.spec_rbfuzz', $v)")
            .collect()
          model :+= model(v)
        case _ => // nothing to roll back to yet: append one row instead
          Seq((nextKey, nextKey * 7)).toDF("key", "bal_cents")
            .coalesce(1).writeTo(tbl).append()
          model :+= model.last + (nextKey -> nextKey * 7)
          nextKey += 1
      }
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == model.last,
        s"head diverged from the model after version ${model.length - 1}")
    }
    // time travel: EVERY retained version serves its model state
    for (v <- model.indices) {
      val got = spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == model(v), s"VERSION AS OF $v diverged from the model")
    }
  }

  test("append is additive; TRUNCATE-overwrite replaces") {
    val tbl = freshTable("spec_app")
    spark.range(3).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).append()
    spark.range(3, 5).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).append()
    assert(spark.table(tbl).count() == 5)
    spark.range(2).selectExpr("id AS key", "id AS bal_cents")
      .writeTo(tbl).overwrite(lit(true))
    assert(spark.table(tbl).orderBy("key").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L))
  }
}
