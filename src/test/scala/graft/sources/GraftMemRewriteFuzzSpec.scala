package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** Model-based fuzz of the round-12 trio — row lineage (b95), the
  * file ledger (b94) and selective rewrite (b96) — on the
  * equality-delete flavor: a seeded walk of upserts (true UPDATE
  * channel), deletes, fresh appends, selective rewrites and full
  * compactions, checked after EVERY step for
  *
  *   1. content equality with a reference map,
  *   2. lineage invariants — an updated key keeps its `_row_id` and
  *      moves `_last_updated_version` to the committing version; an
  *      untouched key's (id, luv) pair never moves, INCLUDING across
  *      rewrites and compactions (maintenance is not an update); a
  *      fresh key mints an id never seen before,
  *   3. ledger consistency — `__files` ranges disjoint, Σ live_rows
  *      equals the model size, live ≤ written per file.
  *
  * The failure modes only a walk reaches: a rewrite dropping a
  * surviving row's lineage, an update inheriting from the WRONG
  * victim after positions moved, a ledger range overlapping after
  * rewrite-then-append interleavings.
  */
class GraftMemRewriteFuzzSpec extends SparkSpec {

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

  test("70-step seeded walk: content, lineage stability and ledger " +
      "consistency hold after every upsert/delete/append/rewrite/" +
      "compact") {
    catalog()
    val name = "fuzz_rw_walk"
    val tbl = s"graftmem.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (key BIGINT NOT NULL, bal BIGINT) " +
      "TBLPROPERTIES ('graft.row_level' = 'merge-on-read', " +
      "'graft.mor.deletes' = 'equality')")
    val table = catalog().loadTable(Identifier.of(Array("db"), name))
      .asInstanceOf[GraftMemMorTable]

    // delta harness with the TRUE update channel: updates pair the
    // victim key with its replacement row (lineage inheritance)
    def delta(dels: Seq[Long], upds: Seq[(Long, Long)],
        ins: Seq[(Long, Long)]): Unit = {
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
      upds.foreach { case (k, v) =>
        w.update(null, org.apache.spark.sql.catalyst.InternalRow(k),
          org.apache.spark.sql.catalyst.InternalRow(k, v))
      }
      ins.foreach { case (k, v) =>
        w.insert(org.apache.spark.sql.catalyst.InternalRow(k, v))
      }
      bw.commit(Array(w.commit()))
    }

    def observed(): Map[Long, (Long, Long, Long)] =
      spark.sql(s"SELECT key, bal, _row_id, _last_updated_version " +
        s"FROM $tbl").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap

    val rnd = new scala.util.Random(23)
    val model = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var prev = Map.empty[Long, (Long, Long, Long)] // key → (bal, id, luv)
    var seenIds = Set.empty[Long]
    var nextFresh = 1000L
    var steps = 0
    var rewrites = 0L
    var rewritesThatMoved = 0L
    while (steps < 70) {
      // the keys THIS step updates (lineage must survive), inserts
      // fresh (id must be new) or deletes
      var updated = Set.empty[Long]
      var inserted = Set.empty[Long]
      rnd.nextInt(5) match {
        case 0 => // UPSERT: existing keys via the UPDATE channel,
          // new keys via insert — one commit
          val pool = model.keys.toVector
          val ks = (0 until (1 + rnd.nextInt(4))).map { _ =>
            if (pool.nonEmpty && rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
            else rnd.nextInt(20).toLong
          }.distinct
          val (ex, fresh) = ks.partition(model.contains)
          val upds = ex.map(k => k -> rnd.nextInt(1000).toLong)
          val ins = fresh.map(k => k -> rnd.nextInt(1000).toLong)
          delta(Seq.empty, upds, ins)
          (upds ++ ins).foreach { case (k, v) => model(k) = v }
          updated = ex.toSet; inserted = fresh.toSet
        case 1 if model.nonEmpty => // DELETE existing keys
          val pool = model.keys.toVector
          val ks = (0 until (1 + rnd.nextInt(3)))
            .map(_ => pool(rnd.nextInt(pool.size))).distinct
          delta(ks, Seq.empty, Seq.empty)
          ks.foreach(model.remove)
        case 2 => // APPEND fresh keys through the base path
          val ins = (0 until (1 + rnd.nextInt(3))).map { _ =>
            val k = nextFresh; nextFresh += 1
            k -> rnd.nextInt(1000).toLong
          }
          spark.sql(s"INSERT INTO $tbl VALUES " +
            ins.map { case (k, v) => s"($k, $v)" }.mkString(", "))
          ins.foreach { case (k, v) => model(k) = v }
          inserted = ins.map(_._1).toSet
        case 3 => // SELECTIVE REWRITE at a random threshold
          val bp = 1000L * (1 + rnd.nextInt(9))
          val r = spark.sql(
            s"CALL graftmem.system.rewrite_files('db.$name', ${bp}L)")
            .collect()(0)
          rewrites += 1
          if (r.getLong(1) > 0) rewritesThatMoved += 1
        case 4 => // FULL COMPACT
          spark.sql(s"CALL graftmem.system.compact('db.$name')").collect()
        case _ => steps -= 1
      }
      steps += 1
      val cur = observed()
      // 1. content
      assert(cur.view.mapValues(_._1).toMap == model.toMap,
        s"step $steps content diverged")
      // 2. lineage invariants
      val curVersion = table.synchronized(table.commitVersion)
      cur.foreach { case (k, (_, id, luv)) =>
        if (updated.contains(k)) {
          assert(prev(k)._2 == id,
            s"step $steps: updated key $k lost its id " +
              s"(${prev(k)._2} -> $id)")
          assert(luv == curVersion,
            s"step $steps: updated key $k luv $luv != $curVersion")
        } else if (inserted.contains(k)) {
          assert(!seenIds.contains(id),
            s"step $steps: fresh key $k reused id $id")
          assert(luv == curVersion)
        } else {
          assert(prev(k) == cur(k),
            s"step $steps: untouched key $k moved " +
              s"${prev(k)} -> ${cur(k)}")
        }
      }
      seenIds ++= cur.values.map(_._2)
      prev = cur
      // 3. ledger consistency
      val files = spark.table(s"${tbl}__files").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      assert(files.map(_._4).sum == model.size.toLong,
        s"step $steps: ledger live sum != model size")
      assert(files.forall(f => f._4 <= f._3 && f._1 <= f._2),
        s"step $steps: malformed file stats ${files.mkString(";")}")
      val sorted = files.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._2 <= b._1,
            s"step $steps: overlapping ledger ranges $a $b")
        case _ => ()
      }
    }
    assert(rewritesThatMoved > 0,
      s"the walk never moved rows through a rewrite ($rewrites " +
        "rewrites ran) — weak run, reseed")
    assert(model.nonEmpty, "the walk emptied the table — weak run")
  }
}
