package graft.operators

import graft.SparkSpec

/** Round-12 operators: c74 persisted ANN index (build once / search
  * cold / maintain incrementally), d32's streaming WAP gate. b94/b95's
  * connector-level proofs live in GraftMemFilesSpec/GraftMemLineageSpec.
  */
class Round12PropsSpec extends SparkSpec {

  test("c74 == c72: the persisted-index search reproduces the " +
      "in-query search EXACTLY (the b75/b80 cross-check applied to ANN)") {
    val a = graft.SparkEntry.queries("c72_ivf_pq_search")(spark, sf0001)
      .collect().toSeq
    val b = graft.SparkEntry.queries("c74_index_search")(spark, sf0001)
      .collect().toSeq
    assert(a.nonEmpty && a == b,
      s"persisted-index search diverged: c72=${a.take(3)} c74=${b.take(3)}")
  }

  test("c74 search plan: reads the PREBUILT graftmem index, touches " +
      "raw vectors in exactly ONE scan (the re-rank fetch), zero " +
      "training in the plan") {
    val (idx, mdl) = TierC.c74Build(spark, sf0001)
    val ann = TierC.c74Search(spark, sf0001, idx, mdl, 5)
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && plan.contains("annidx"),
      s"the search must scan the persisted index table:\n$plan")
    val nParquet = "FileScan".r.findAllIn(plan).length
    assert(nParquet == 1,
      s"the search may touch raw embeddings only in the re-rank " +
        s"fetch (found $nParquet file scans):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the shortlist re-rank must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // and the search really searches: a well-formed per-probe top-5
    val rows = ann.collect()
    assert(rows.nonEmpty && rows.groupBy(_.getLong(0))
      .forall(_._2.length <= 5))
  }

  test("c74 build is incremental: the index table landed as TWO " +
      "append commits (initial build + maintenance), together " +
      "covering the full universe") {
    val (idx, mdl) = TierC.c74Build(spark, sf0001)
    // two landing commits: the initial slice and the late ≡7 slice
    val versions = spark.sql(
      s"SELECT version FROM ${idx}__history ORDER BY version").collect()
      .map(_.getLong(0)).toSeq
    assert(versions == Seq(0L, 1L, 2L),
      s"expected create + two append commits, got versions $versions")
    val n = spark.table(idx).count()
    val expected = spark.table(s"graftmem.db.${idx.split('.').last}")
      .count() // self-consistency read
    assert(n == expected)
    val universe = graft.util.Tables.embeddings(spark, sf0001)
      .filter("vec_id >= 8").count()
    assert(n == universe,
      s"index must cover the full universe: $n vs $universe")
    // the model artifact is exactly the 768 codebook cells
    assert(spark.table(mdl).count() == 8L * 64L + 4L * 4L * 16L)
  }
}
