package graft.sources

import graft.SparkSpec

/** Schema evolution (b85): ALTER TABLE ADD COLUMN is a metadata-only
  * commit on both flavors — pre-ALTER rows surface the new column as
  * its initial default (0) with no data rewrite, row-level writes
  * against the widened schema work, historical versions keep their
  * pre-ALTER schema, and everything else stays loudly unsupported.
  */
class GraftMemSchemaEvolutionSpec extends SparkSpec {

  private def fresh(name: String, props: String = ""): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT)$props")
    tbl
  }

  test("CoW: ADD COLUMN widens without rewriting; old rows read the " +
      "initial default; row-level UPDATE sets the new column") {
    val tbl = fresh("spec_se_cow")
    spark.range(6).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // v1, 2-col rows
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (bonus BIGINT)") // v2
    assert(spark.table(tbl).schema.fieldNames.toSeq
      == Seq("key", "bal", "bonus"))
    spark.range(100, 103)
      .selectExpr("id AS key", "id AS bal", "id * 2 AS bonus")
      .writeTo(tbl).append() // v3, 3-col rows
    val got0 = spark.sql(
      s"SELECT key, bal, bonus FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got0 == (0L until 6L).map(k => (k, k * 10, 0L)) ++
      (100L until 103L).map(k => (k, k, k * 2)))
    // row-level UPDATE on the widened schema: the rewrite pads old
    // rows and persists the new column
    spark.sql(s"UPDATE $tbl SET bonus = bonus + 7 WHERE key % 2 = 0")
    val got = spark.sql(
      s"SELECT key, bonus FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(0L -> 7L, 1L -> 0L, 2L -> 7L, 3L -> 0L, 4L -> 7L,
      5L -> 0L, 100L -> 207L, 101L -> 202L, 102L -> 211L))
    // history: the pre-ALTER version keeps the pre-ALTER schema
    val v1 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq == Seq("key", "bal"))
    assert(v1.count() == 6)
    // the ALTER itself is a (content-identical) version
    val v2 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2")
    assert(v2.schema.fieldNames.toSeq == Seq("key", "bal", "bonus"))
    assert(v2.selectExpr("CAST(sum(bonus) AS BIGINT)").head().getLong(0)
      == 0L)
  }

  test("MoR: ADD COLUMN + MERGE over the widened schema; the change " +
      "feed pads pre-ALTER entries") {
    val tbl = fresh("spec_se_mor",
      " TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    spark.range(4).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // v1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (bonus BIGINT)") // v2
    spark.range(2, 6)
      .selectExpr("id AS key", "id * 100 AS nb", "id * 1000 AS nbon")
      .createOrReplaceTempView("spec_se_mor_batch")
    spark.sql(
      s"""MERGE INTO $tbl t USING spec_se_mor_batch b ON t.key = b.key
         |WHEN MATCHED THEN UPDATE SET bal = b.nb, bonus = b.nbon
         |WHEN NOT MATCHED THEN INSERT (key, bal, bonus)
         |  VALUES (b.key, b.nb, b.nbon)""".stripMargin) // v3
    val got = spark.sql(
      s"SELECT key, bal, bonus FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 200L, 2000L),
      (3L, 300L, 3000L), (4L, 400L, 4000L), (5L, 500L, 5000L)))
    // change feed: v1 inserts logged with 2-col rows read bonus = 0
    val feed = spark.sql(
      s"""SELECT _commit_version, _change_type,
         |  CAST(sum(bonus) AS BIGINT) AS b FROM ${tbl}__changes
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(feed == Seq((1L, "insert", 0L), (3L, "delete", 0L),
      (3L, "insert", 14000L)))
  }

  test("typed DEFAULTs (round 11): INT/STRING/BOOLEAN/DECIMAL columns " +
      "with literal defaults resolve on every read face — live scan, " +
      "snapshot, change feed, MoR merge — and persist through writes") {
    // ---- CoW flavor: live + snapshot
    val tbl = fresh("spec_se_typed")
    spark.range(3).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // v1 — 2-col generation
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (" +
      "tier STRING DEFAULT 'basic', vip BOOLEAN DEFAULT true, " +
      "pct INT DEFAULT 7, fee DECIMAL(10,2) DEFAULT 1.25)") // v2-5
    // pre-ALTER rows surface every default, typed
    val live = spark.sql(
      s"SELECT key, tier, vip, pct, fee FROM $tbl ORDER BY key").collect()
    assert(live.forall(r => r.getString(1) == "basic" && r.getBoolean(2)
      && r.getInt(3) == 7 &&
      r.getDecimal(4) == new java.math.BigDecimal("1.25")),
      live.mkString("; "))
    // writes through the widened schema persist typed cells
    spark.sql(s"INSERT INTO $tbl VALUES " +
      "(100, 1, 'gold', false, 42, 9.99)")
    val g = spark.sql(s"SELECT tier, vip, pct, fee FROM $tbl " +
      "WHERE key = 100").head()
    assert(g.getString(0) == "gold" && !g.getBoolean(1) &&
      g.getInt(2) == 42 &&
      g.getDecimal(3) == new java.math.BigDecimal("9.99"))
    // row-level UPDATE can set the typed columns (old rows enter the
    // rewrite as defaults, exit materialized)
    spark.sql(s"UPDATE $tbl SET tier = 'plus', vip = false " +
      "WHERE key = 1")
    val u = spark.sql(s"SELECT tier, vip, pct FROM $tbl WHERE key = 1")
      .head()
    assert(u.getString(0) == "plus" && !u.getBoolean(1) && u.getInt(2) == 7)
    // a pre-ALTER snapshot presents the pre-ALTER schema; a
    // post-ALTER snapshot pads with the typed defaults
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
      .schema.fieldNames.toSeq == Seq("key", "bal"))
    val snap = spark.sql(
      s"SELECT tier, vip FROM $tbl VERSION AS OF 5 WHERE key = 0").head()
    assert(snap.getString(0) == "basic" && snap.getBoolean(1))

    // ---- MoR flavor: merge + change feed
    spark.sql("DROP TABLE IF EXISTS graftmem.db.spec_se_typed_mor")
    spark.sql("CREATE TABLE graftmem.db.spec_se_typed_mor " +
      "(key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    val mor = "graftmem.db.spec_se_typed_mor"
    spark.range(3).selectExpr("id AS key", "id AS bal")
      .writeTo(mor).append()
    spark.sql(s"ALTER TABLE $mor ADD COLUMNS (tag STRING DEFAULT 'x')")
    spark.sql(s"UPDATE $mor SET tag = 'hit' WHERE key = 1")
    val morGot = spark.sql(s"SELECT key, tag FROM $mor ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(morGot == Seq((0L, "x"), (1L, "hit"), (2L, "x")))
    // the change feed types the column and pads pre-ALTER entries
    val feed = spark.table(s"${mor}__changes")
      .selectExpr("_commit_version", "_change_type", "key", "tag")
      .orderBy("_commit_version", "_change_type", "key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(feed == Seq(
      (1L, "insert", 0L, "x"), (1L, "insert", 1L, "x"),
      (1L, "insert", 2L, "x"),
      (3L, "delete", 1L, "x"), (3L, "insert", 1L, "hit")), feed)
  }

  test("ALTER is atomic: one unsupported change in a multi-column " +
      "ADD leaves the table untouched") {
    val tbl = fresh("spec_se_atomic")
    val err = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (a BIGINT, b DOUBLE)")
    }
    assert(err.getMessage.contains("supported ALTERs are"))
    assert(spark.table(tbl).schema.fieldNames.toSeq == Seq("key", "bal"),
      "failed multi-column ALTER half-applied")
  }

  test("an in-flight group-pruned rewrite scanned under the old " +
      "schema conflicts with an interleaved ALTER") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = "graftmem.db.spec_se_conflict"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, g BIGINT, bal BIGINT) " +
      "PARTITIONED BY (g)")
    spark.range(10).selectExpr("id AS key", "id % 2 AS g", "id AS bal")
      .writeTo(tbl).append()
    val table = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "spec_se_conflict"))
      .asInstanceOf[GraftMemTable]
    // op scans (pins version) → ALTER commits → op's commit must
    // reject: the rewrite was computed under the old schema and would
    // write old-width rows for a group the ALTER already stamped
    val op = table.newRowLevelOperationBuilder(
      new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
        override def command() = org.apache.spark.sql.connector.write
          .RowLevelOperation.Command.UPDATE
        override def options() =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }).build()
    val scan = op.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build()
    scan.toBatch.planInputPartitions()
    // narrow to group 0, as the runtime group filter would
    scan.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsRuntimeV2Filtering].filter(Array(
      new org.apache.spark.sql.connector.expressions.filter.Predicate(
        "IN", Array(
          org.apache.spark.sql.connector.expressions.Expressions
            .column("_group"),
          org.apache.spark.sql.connector.expressions.Expressions
            .literal(0L)))))
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (extra BIGINT)")
    val bw = op.newWriteBuilder(
      new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = "spec"
        override def schema() = table.schema()
        override def options() =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }).build().toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
    val err = intercept[GraftMemCommitConflictException] {
      bw.commit(Array(w.commit()))
    }
    assert(err.getMessage.contains("changed after this operation's scan"),
      err.getMessage)
  }

  test("snapshot history is bounded by graft.snapshot_keep; " +
      "expired-by-retention versions error like explicit expiry") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val tbl = "graftmem.db.spec_se_keep"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.snapshot_keep' = '3')")
    (1 to 6).foreach { i =>
      spark.range(i).selectExpr("id AS key", "id AS bal")
        .writeTo(tbl).append()
    } // v1..v6; retention keeps v4..v6
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 6").count() == 21)
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 4").count() == 10)
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2").count()
    }
    assert(err.getMessage.contains("retained: 4..6"), err.getMessage)
    assert(spark.table(tbl).count() == 21)
  }

  test("b101 RENAME COLUMN: metadata-only — old rows serve through " +
      "the new name, the old name is gone, time travel keeps it") {
    val tbl = fresh("spec_se_rename")
    spark.range(4).selectExpr("id AS key", "id * 10 AS bal")
      .writeTo(tbl).append() // v1
    val t = GraftMemCatalog.lookup(tbl.stripPrefix("graftmem."))
      .asInstanceOf[GraftMemTable]
    val rowsBefore = t.rows
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN bal TO balance") // v2
    assert(t.rows eq rowsBefore,
      "RENAME must be metadata-only: the row vector object itself " +
        "must be untouched")
    assert(spark.table(tbl).schema.fieldNames.toSeq
      == Seq("key", "balance"))
    // old rows serve through the renamed column; writes by the new
    // name land in the same physical slot
    spark.range(10, 12).selectExpr("id AS key", "id * 10 AS balance")
      .writeTo(tbl).append() // v3
    val got = spark.sql(
      s"SELECT key, balance FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ((0L until 4L) ++ (10L until 12L)).map(k => (k, k * 10)))
    // the old name is really gone from the current schema
    intercept[Exception] {
      spark.sql(s"SELECT bal FROM $tbl").collect()
    }
    // …but VERSION AS OF a pre-rename commit serves the OLD shape
    val old = spark.sql(s"SELECT bal FROM $tbl VERSION AS OF 1")
    assert(old.collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 10L, 20L, 30L))
  }

  test("b101 DROP COLUMN: metadata-only, slot orphaned — a later ADD " +
      "gets a fresh slot and can never resurrect dropped data") {
    val tbl = fresh("spec_se_drop")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (scratch BIGINT DEFAULT 5)")
    spark.range(3)
      .selectExpr("id AS key", "id AS bal", "id + 100 AS scratch")
      .writeTo(tbl).append() // rows store scratch at its slot
    val t = GraftMemCatalog.lookup(tbl.stripPrefix("graftmem."))
      .asInstanceOf[GraftMemTable]
    val rowsBefore = t.rows
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN scratch")
    assert(t.rows eq rowsBefore,
      "DROP must be metadata-only: no data pass, no rewrite")
    assert(spark.table(tbl).schema.fieldNames.toSeq == Seq("key", "bal"))
    intercept[Exception] {
      spark.sql(s"SELECT scratch FROM $tbl").collect()
    }
    // re-add a column under a NEW name: old rows must read ITS
    // default, never the dropped column's stored cells (the
    // field-id/slot-reuse resurrection bug this design exists to kill)
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (fresh BIGINT DEFAULT 9)")
    val got = spark.sql(
      s"SELECT key, bal, fresh FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == (0L until 3L).map(k => (k, k, 9L)),
      "a fresh column must not resurrect dropped data")
    // and even re-adding the SAME NAME gets a fresh slot
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (scratch BIGINT DEFAULT 7)")
    val got2 = spark.sql(s"SELECT scratch FROM $tbl").collect()
      .map(_.getLong(0)).toSeq
    assert(got2 == Seq(7L, 7L, 7L),
      "re-adding a dropped column's name must serve the new default, " +
        "not the dropped cells")
  }

  test("b101 WIDEN INT -> BIGINT: old narrow rows read back exactly; " +
      "post-widen writes store beyond Int range; defaults pad as long") {
    val tbl = fresh("spec_se_widen")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (cnt INT DEFAULT 3)")
    spark.range(2).selectExpr("id AS key", "id AS bal",
      "CAST(id + 10 AS INT) AS cnt")
      .writeTo(tbl).append() // narrow Integer cells
    spark.range(2, 3).selectExpr("id AS key", "id AS bal")
      .writeTo(tbl).append() // pads cnt with the INT default
    val t = GraftMemCatalog.lookup(tbl.stripPrefix("graftmem."))
      .asInstanceOf[GraftMemTable]
    val rowsBefore = t.rows
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN cnt TYPE BIGINT")
    assert(t.rows eq rowsBefore,
      "widening must be metadata-only: no data pass, no rewrite")
    assert(spark.table(tbl).schema("cnt").dataType
      == org.apache.spark.sql.types.LongType)
    // post-widen value beyond Int range
    spark.sql(s"INSERT INTO $tbl VALUES (9, 9, ${1L << 40})")
    val got = spark.sql(
      s"SELECT key, cnt FROM $tbl ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 10L), (1L, 11L), (2L, 3L), (9L, 1L << 40)),
      "old Integer cells and the old default must read back exactly " +
        "as the longs they upcast to")
    // time travel to the pre-widen version serves the INT shape
    val oldT = spark.sql(s"SELECT cnt FROM $tbl VERSION AS OF 3")
    assert(oldT.schema("cnt").dataType
      == org.apache.spark.sql.types.IntegerType)
    assert(oldT.collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 10, 11))
    // narrowing and non-integral changes stay loudly unsupported
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN cnt TYPE INT")
    }
    assert(e.getMessage.contains("INT -> BIGINT") ||
      e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("cannot be cast"), e.getMessage)
  }

  test("b101 structural guards: partition/layout columns can be " +
      "neither renamed nor dropped; merge-on-read stays ADD-only") {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val part = "graftmem.db.spec_se_guard_part"
    spark.sql(s"DROP TABLE IF EXISTS $part")
    spark.sql(s"CREATE TABLE $part (key BIGINT, g BIGINT) " +
      "PARTITIONED BY (g)")
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $part RENAME COLUMN g TO grp")
    }
    assert(e1.getMessage.contains("anchors"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $part DROP COLUMN g")
    }
    assert(e2.getMessage.contains("anchors"), e2.getMessage)
    val mor = "graftmem.db.spec_se_guard_mor"
    spark.sql(s"DROP TABLE IF EXISTS $mor")
    spark.sql(s"CREATE TABLE $mor (key BIGINT, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read')")
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $mor RENAME COLUMN bal TO balance")
    }
    assert(e3.getMessage.contains("merge-on-read"), e3.getMessage)
  }

  test("b101 multi-change ALTER is atomic: a failing later change " +
      "leaves earlier changes unapplied") {
    val tbl = fresh("spec_se_multi")
    val t = GraftMemCatalog.lookup(tbl.stripPrefix("graftmem."))
      .asInstanceOf[GraftMemTable]
    // two renames where the second targets the first's SOURCE (gone
    // by then): the statement must fail as a whole with no trace
    intercept[Exception] {
      t.synchronized(()) // touch to ensure table is materialized
      spark.sessionState.catalogManager.catalog("graftmem")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .alterTable(
          org.apache.spark.sql.connector.catalog.Identifier
            .of(Array("db"), "spec_se_multi"),
          org.apache.spark.sql.connector.catalog.TableChange
            .renameColumn(Array("bal"), "balance"),
          org.apache.spark.sql.connector.catalog.TableChange
            .renameColumn(Array("bal"), "money"))
    }
    assert(spark.table(tbl).schema.fieldNames.toSeq == Seq("key", "bal"),
      "failed multi-change ALTER half-applied")
  }

  test("unsupported alters and duplicate columns fail loudly") {
    val tbl = fresh("spec_se_bad")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (v DOUBLE)")
    }
    assert(e2.getMessage.contains("supported ALTERs are"))
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (extra BIGINT)")
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (extra BIGINT)")
    }
    assert(e3.getMessage.contains("already exists"))
    // DEFAULT NULL has no cell representation — loud, not silent
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (n BIGINT DEFAULT NULL)")
    }
    assert(e4.getMessage.contains("DEFAULT NULL"), e4.getMessage)
  }
}
