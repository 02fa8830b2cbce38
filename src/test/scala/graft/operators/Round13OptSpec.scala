package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-13 OPTIMIZATION guards: each rewrite that changed an
  * operator's internals pins its new plan shape (so a regression back
  * to the shuffle-heavy form fails loudly, the way the plan files under
  * plans/r13/ document it) and, where the rewrite leaned on an
  * algebraic identity, the identity itself is property-checked.
  * Result identity is separately enforced by the DuckDB oracle at two
  * SFs — these specs guard the SHAPE, which the oracle cannot see.
  */
class Round13OptSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("c5: document frequency dedups map-side (no distinct aggregate)") {
    val p = plan("c5_text_tfidf")
    assert(p.contains("array_distinct"), p)
    assert(!p.toLowerCase.contains("count(distinct"), p)
  }

  test("c67/c70 (bm25Scored): dl is a projection, df dedups map-side") {
    val p = plan("c67_bm25")
    // doc length must come straight from size(split(text)) — no
    // token-stream aggregate keyed on doc_id alone BELOW the tf join
    // (the final per-doc score aggregate is keyed on doc_id too, so
    // assert the old dfT marker instead: no aggregate keyed on BOTH
    // doc_id and the word column, which only the removed
    // tok.distinct() produced)
    assert(p.contains("array_distinct"), p)
    // exactly-two-key form: tf's legitimate (doc_id, w, df) aggregate
    // has a third key, so it must not trip this
    assert(!p.matches("(?s).*keys=\\[doc_id#\\d+L?, w#\\d+\\].*"),
      s"tok.distinct()'s (doc_id, w) aggregate is back:\n$p")
    assert(p.contains("size(split("), p)
  }

  test("c39: dup-gram flag is one partial-agg'd pass (min!=max), not distinct+count") {
    val p = plan("c39_dup_passage")
    assert(p.contains("min(doc_id"), p)
    assert(p.contains("max(doc_id"), p)
    assert(!p.matches("(?s).*keys=\\[gram[^\\]]*doc_id.*"),
      s"the removed distinct-(gram,doc_id) aggregate is back:\n$p")
  }

  test("c58: one unordered-frame window replaces dense_rank+max (3 Window nodes)") {
    val p = plan("c58_dup_spans")
    val windows = "Window \\[".r.findAllIn(p).length
    assert(windows == 3, s"expected 3 Window nodes, got $windows:\n$p")
    assert(!p.contains("dense_rank"), p)
  }

  test("c50: line document-frequency dedups map-side") {
    val p = plan("c50_boilerplate_blocks")
    assert(p.contains("array_distinct"), p)
    assert(!p.matches("(?s).*keys=\\[line[^\\]]*doc_id.*"),
      s"the removed distinct-(line,doc_id) aggregate is back:\n$p")
  }

  test("min(doc)!=max(doc) over a group IS 'appears in >=2 distinct docs'") {
    // the identity behind the c39/c58 rewrites, checked against the
    // literal countDistinct form on generated groups that include the
    // tricky case (same doc repeated within one gram)
    import org.scalacheck.Gen
    val gen = Gen.listOfN(24, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 3L)))
    forAllN(gen, 30) { rows =>
      val df = spark.createDataFrame(rows.map(r => (r._1, r._2)))
        .toDF("g", "doc")
      val viaMinMax = df.groupBy("g")
        .agg(min("doc").as("mn"), max("doc").as("mx"))
        .filter(col("mn") =!= col("mx")).select("g")
        .collect().map(_.getLong(0)).toSet
      val viaDistinct = df.select("g", "doc").distinct()
        .groupBy("g").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("g")
        .collect().map(_.getLong(0)).toSet
      assert(viaMinMax == viaDistinct, s"$viaMinMax vs $viaDistinct")
    }
  }

  test("b50's seed pattern: id-derived key plans a hash join, lit() would not") {
    // the regression the census caught: a literal seed column
    // constant-folds out of the join condition and the planner falls
    // back to BroadcastNestedLoopJoin; deriving the key from range's
    // id keeps ExtractEquiJoinKeys in business
    val edges = spark.range(100).select(col("id").as("u"))
    val good = spark.range(1).select((col("id") - 2L).as("node"))
      .join(edges, col("node") === col("u"))
      .queryExecution.executedPlan.toString
    assert(!good.contains("NestedLoop"), good)
    val bad = spark.range(1).select(lit(-2L).as("node"))
      .join(edges, col("node") === col("u"))
      .queryExecution.executedPlan.toString
    assert(bad.contains("BroadcastNestedLoopJoin"),
      s"planner behaviour changed — revisit the b50 seed comment:\n$bad")
  }

  test("adaptiveSplitBytes: floor on toy corpora, cap at scale, safe fallbacks") {
    val f = graft.util.GraftConf.adaptiveSplitBytes _
    // every local SF sits on the 16 MB floor → bench numbers unchanged
    assert(f("/root/testdata/sf0.1", "4") == (16L << 20))
    assert(f("/root/testdata/sf0.001", "4") == (16L << 20))
    // an unreadable dir degrades to the floor, never throws
    assert(f("/no/such/dir", "4") == (16L << 20))
    // a non-numeric core count falls back to host processors, floor holds
    assert(f("/root/testdata/sf0.01", "*") == (16L << 20))
  }
}
