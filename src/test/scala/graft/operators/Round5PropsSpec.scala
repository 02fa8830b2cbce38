package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-5 operator properties: c46 URL canonicalization, c47 BPE merge
  * application, c48 weighted sampling, c49 DSIR importance, c50
  * boilerplate-block removal, c51 semantic dedup.
  */
class Round5PropsSpec extends SparkSpec {

  test("c46: canonicalization folds case/www/utm/trailing-slash variants") {
    val rows = SparkEntry.queries("c46_dedup_url")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // every canonical url is already canonical: lowercase, no www, no
    // utm params, no trailing slash, no '/?'
    rows.foreach { r =>
      val u = r.getAs[String]("canon_url")
      assert(u == u.toLowerCase, u)
      assert(!u.contains("://www."), u)
      assert(!u.contains("utm_"), u)
      assert(!u.endsWith("/"), u)
      assert(!u.contains("/?"), u)
    }
    // the synthetic messiness actually exercised the folding: some
    // canonical groups collapse >1 raw variant
    assert(rows.exists(_.getAs[Long]("n_variants") > 1))
    // group counts cover the full corpus exactly once
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == 500L)
  }

  test("c47: merges never lengthen a word; both merges are trained non-trivially") {
    val rows = SparkEntry.queries("c47_tokenizer_apply")(spark, sf0001).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("tok2") <= r.getAs[Long]("tok0"))
      assert(r.getAs[Long]("tok2") >= 1L)
      // merge 1 is a 2-char pair; merge 2 is a token pair "a b"
      assert(r.getAs[String]("merge1").length == 2)
      assert(r.getAs[String]("merge2").contains(" "))
    }
    // the merges fire somewhere in the top-25 (compression is real)
    assert(rows.exists(r => r.getAs[Long]("tok2") < r.getAs[Long]("tok0")))
  }

  test("c48: exactly k rows, weights in range, priority order strict") {
    val rows = SparkEntry.queries("c48_sample_weighted")(spark, sf0001).collect()
    assert(rows.length == 100)
    val keys = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("sample_key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val wt = r.getAs[Long]("wt")
      assert(wt >= 1L && wt <= 4L)
      assert(r.getAs[Long]("sample_key") >= 0L)
    }
    // weighting is visible: the sample over-represents high-weight
    // sources relative to a uniform draw (wt=4 sources are 4x as likely
    // per doc as wt=1; with 500 docs and k=100 this is overwhelming)
    val avgWt = rows.map(_.getAs[Long]("wt")).sum.toDouble / rows.length
    assert(avgWt > 2.5, s"sample mean weight $avgWt not > corpus mean 2.5")
  }

  test("c49: flag is exactly the doc-mean vs corpus-mean comparison") {
    val rows = SparkEntry.queries("c49_dsir_importance")(spark, sf0001).collect()
    assert(rows.length == 500)
    // both sides of the corpus-mean flag are populated (the flag
    // discriminates, it is not a constant)
    val flags = rows.map(_.getAs[Boolean]("above_corpus_mean")).toSet
    assert(flags == Set(true, false))
    // target docs (src1) score above the corpus mean more often than
    // the rest — the importance direction is right
    val src = graft.util.Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val (t, o) = rows.partition(r => src(r.getAs[Long]("doc_id")) == "src1")
    val tRate = t.count(_.getAs[Boolean]("above_corpus_mean")).toDouble / t.length
    val oRate = o.count(_.getAs[Boolean]("above_corpus_mean")).toDouble / o.length
    assert(tRate > oRate, s"target rate $tRate !> other rate $oRate")
  }

  test("c50: docs with no boilerplate keep their exact original text") {
    val rows = SparkEntry.queries("c50_boilerplate_blocks")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = graft.util.Tables.documents(spark, sf0001)
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
    assert(docs.nonEmpty)
    var clean = 0
    docs.foreach { dr =>
      val r = rows(dr.getAs[Long]("doc_id"))
      if (r.getAs[Long]("n_boiler") == 0L) {
        // blocks partition the word sequence, so re-joining all kept
        // blocks must reproduce the document byte-for-byte
        assert(r.getAs[String]("clean_fp") == dr.getAs[String]("fp"))
        clean += 1
      } else {
        assert(r.getAs[String]("clean_fp") != dr.getAs[String]("fp"))
      }
    }
    assert(clean > 0)
    assert(rows.values.exists(_.getAs[Long]("n_boiler") > 0L))
  }

  test("c51: keep verdict is exactly the earlier-in-bucket near-dup rule") {
    val rows = SparkEntry.queries("c51_semantic_dedup")(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val kept = r.getAs[Boolean]("kept")
      val n = r.getAs[Long]("n_early_dups")
      val blocker = r.getAs[Long]("blocker")
      assert(kept == (n == 0L))
      if (n > 0L) assert(blocker >= 0L && blocker < r.getAs[Long]("vec_id"))
      else assert(blocker == -1L)
    }
    // the dedup fires on this corpus and the smallest id in every
    // bucket always survives
    assert(rows.exists(!_.getAs[Boolean]("kept")))
    val byBucket = rows.groupBy(_.getAs[Long]("bucket"))
    byBucket.values.foreach { members =>
      val minVec = members.map(_.getAs[Long]("vec_id")).min
      assert(members.find(_.getAs[Long]("vec_id") == minVec)
        .get.getAs[Boolean]("kept"))
    }
  }
}
