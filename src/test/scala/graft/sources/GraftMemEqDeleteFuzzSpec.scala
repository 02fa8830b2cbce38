package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** Model-based fuzz of the equality-delete boundary semantics (b91):
  * a seeded random walk of upserts, deletes, fresh-key appends and
  * compactions against one table, checked after EVERY commit against
  * a plain in-memory map applying upsert semantics. The boundary rule
  * ("a delete kills only the key's rows written before its commit")
  * has exactly the failure modes a walk like this flushes out —
  * a delete eating its own commit's re-insert, a stale boundary
  * surviving compaction, an append landing below an earlier delete's
  * boundary — and none of them are reachable from the handful of
  * hand-written spec scenarios alone.
  */
class GraftMemEqDeleteFuzzSpec extends SparkSpec {

  private def catalog(): TableCatalog = {
    spark.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[TableCatalog]
  }

  private def writeInfo(t: org.apache.spark.sql.connector.catalog.Table) =
    new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "fuzz"
      override def schema(): org.apache.spark.sql.types.StructType =
        t.schema()
      override def options()
          : org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }

  test("60-step seeded walk: upsert/delete/append/compact all agree " +
      "with the reference map after every commit") {
    catalog()
    val name = "fuzz_eq_walk"
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT NOT NULL, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
    val table = catalog().loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemMorTable]

    // op-level delta harness: scan (pins the version) then a delta of
    // key-addressed deletes + inserts — the WriteDelta writer path
    def delta(dels: Seq[Long], ins: Seq[(Long, Long)]): Unit = {
      val op = table.newRowLevelOperationBuilder(
        new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
          override def command() = org.apache.spark.sql.connector.write
            .RowLevelOperation.Command.MERGE
          override def options() =
            org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
        }).build().asInstanceOf[
          org.apache.spark.sql.connector.write.SupportsDelta]
      op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()
      val bw = op.newWriteBuilder(writeInfo(table)).build().toBatch
      val w = bw.createBatchWriterFactory(null)
        .asInstanceOf[org.apache.spark.sql.connector.write
          .DeltaWriterFactory].createWriter(0, 0L)
      dels.foreach(k =>
        w.delete(null, org.apache.spark.sql.catalyst.InternalRow(k)))
      ins.foreach { case (k, v) =>
        w.insert(org.apache.spark.sql.catalyst.InternalRow(k, v))
      }
      bw.commit(Array(w.commit()))
    }

    val rnd = new scala.util.Random(11)
    val model = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var nextFresh = 1000L
    var steps = 0
    var compactions = 0
    while (steps < 60) {
      rnd.nextInt(4) match {
        case 0 => // UPSERT a random key mix (existing get del+ins)
          val pool = model.keys.toVector
          val ks = (0 until (1 + rnd.nextInt(4))).map { _ =>
            if (pool.nonEmpty && rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
            else rnd.nextInt(20).toLong
          }.distinct
          val dels = ks.filter(model.contains)
          val ins = ks.map(k => k -> rnd.nextInt(1000).toLong)
          delta(dels, ins)
          ins.foreach { case (k, v) => model(k) = v }
        case 1 if model.nonEmpty => // DELETE some existing keys
          val pool = model.keys.toVector
          val ks = (0 until (1 + rnd.nextInt(3)))
            .map(_ => pool(rnd.nextInt(pool.size))).distinct
          delta(ks, Seq.empty)
          ks.foreach(model.remove)
        case 2 => // APPEND fresh keys through the base-row path — the
          // rows must land ABOVE every earlier delete's boundary
          val ins = (0 until (1 + rnd.nextInt(3))).map { _ =>
            val k = nextFresh; nextFresh += 1
            k -> rnd.nextInt(1000).toLong
          }
          spark.sql(s"INSERT INTO $tbl VALUES " +
            ins.map { case (k, v) => s"($k, $v)" }.mkString(", "))
          ins.foreach { case (k, v) => model(k) = v }
        case 3 => // COMPACT — must be invisible to every later step
          spark.sql(s"CALL graftmem.system.compact('db.$name')")
            .collect()
          compactions += 1
        case _ => // model empty and op=1: skip the step
          steps -= 1
      }
      steps += 1
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = model.toSeq.sorted
      assert(got == want,
        s"step $steps diverged from the model:\n got $got\nwant $want")
    }
    assert(compactions > 0, "the walk never compacted — weak run")
    assert(model.nonEmpty, "the walk emptied the table — weak run")
    // the walk must also have exercised a key's delete+re-insert in
    // one commit (an upsert of an existing key) — the boundary rule's
    // whole point
    assert(table.eqDeletes.nonEmpty || compactions > 0)
  }

  test("deterministic twin: the same seed replays to the same table " +
      "content (the walk itself is reproducible)") {
    // a cheap guard that the fuzz above is debuggable when it fails:
    // same seed, tiny walk, twice, same content
    def run(name: String): Seq[(Long, Long)] = {
      catalog()
      val tbl = s"graftmem.db.$name"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl (key BIGINT NOT NULL, bal BIGINT) " +
        "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
        "'graft.mor.deletes' = 'equality')")
      val rnd = new scala.util.Random(7)
      (0 until 10).foreach { _ =>
        val k = rnd.nextInt(5)
        val v = rnd.nextInt(100)
        spark.sql(s"MERGE INTO $tbl t USING (SELECT CAST($k AS BIGINT)" +
          s" AS key, CAST($v AS BIGINT) AS bal) b ON t.key = b.key " +
          "WHEN MATCHED THEN UPDATE SET bal = b.bal " +
          "WHEN NOT MATCHED THEN INSERT (key, bal) VALUES (b.key, b.bal)")
      }
      spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(run("fuzz_eq_det1") == run("fuzz_eq_det2"))
  }
}
