package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** End-to-end fuzz for the round-3 text ops: random corpora are written
  * as real documents.parquet dirs and each query's output is checked
  * against an independent driver-side recomputation (the DuckDB oracle
  * pins ONE corpus; these pin the LOGIC on many).
  */
class PipelineFuzzSpec extends SparkSpec {

  // ~40 distinct words of varied length: the top-20 stop-list cut
  // actually binds, and equal-count ties at the boundary exercise the
  // (-cnt, term) tie-break
  private val vocab: Vector[String] =
    Vector("a", "bb", "ccc", "dddd", "wordy", "x", "longishword") ++
      (0 until 33).map(i => "w" + ("z" * (i % 9)) + i)

  private val genCorpus: Gen[List[String]] = for {
    nDocs <- Gen.choose(1, 25)
    docs <- Gen.listOfN(nDocs, for {
      nw <- Gen.choose(1, 40)
      ws <- Gen.listOfN(nw, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  private def writeCorpus(texts: List[String]): String = {
    import spark.implicits._
    val dir = graft.util.TmpDir.fresh("fuzz-corpus")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("c32 verdicts match a driver-side recomputation on random corpora") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      val got = SparkEntry.queries("c32_curation_gate")(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ")
        val n = toks.length.toLong
        val sumLen = toks.map(_.length.toLong).sum
        val maxC = toks.groupBy(identity).values.map(_.length).max.toLong
        val lenBp = 100L * sumLen / n
        val repBp = 10000L * maxC / n
        val verdict =
          if (n < 20) "too_short" else if (n > 90) "too_long"
          else if (lenBp < 350 || lenBp > 700) "word_len"
          else if (repBp > 1500) "repetitive" else "keep"
        assert(got(i.toLong) == ((n, lenBp, repBp, verdict)),
          s"doc $i '$t': ${got(i.toLong)} != ${(n, lenBp, repBp, verdict)}")
      }
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("c34 chunks match brute-force slicing on random corpora") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      val got = SparkEntry.queries("c34_doc_chunk")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getString(4))))
      val expect = texts.zipWithIndex.flatMap { case (t, i) =>
        val w = t.split(" ", -1)
        (0 until w.length by 48).map { s =>
          val chunk = w.slice(s, math.min(s + 64, w.length))
          (i.toLong, (s / 48).toLong) ->
            ((s.toLong, chunk.length.toLong, md5hex(chunk.mkString(" "))))
        }
      }
      assert(got.toMap == expect.toMap,
        s"chunks diverge: got ${got.length}, expect ${expect.length}")
    }
  }

  test("c38 containment scores match brute-force shingle sets; pair set == c26's") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      def shingles(t: String): Set[String] = {
        val w = t.split(" ", -1)
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val sh = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> shingles(t) }.toMap
      val con = SparkEntry.queries("c38_dedup_containment")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val jacPairs = SparkEntry.queries("c26_dedup_pipeline")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(con.keySet == jacPairs)
      con.foreach { case ((u, v), bp) =>
        val inter = (sh(u) & sh(v)).size.toLong
        val expect = 10000L * inter / math.min(sh(u).size, sh(v).size)
        assert(bp == expect, s"pair ($u,$v): $bp != $expect")
      }
    }
  }

  test("c39 dup-passage stats match brute force on random corpora") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      val grams = texts.zipWithIndex.flatMap { case (t, i) =>
        val w = t.split(" ", -1)
        (0 to w.length - 5).map(j => (i.toLong, w.slice(j, j + 5).mkString(" ")))
      }
      val dup = grams.distinct.groupBy(_._2).view
        .mapValues(_.size).filter(_._2 >= 2).keySet.toSet
      val expected = grams.groupBy(_._1).view.map { case (id, g) =>
        val dp = g.count(p => dup.contains(p._2)).toLong
        id -> ((g.size.toLong, dp, dp * 10000L / g.size))
      }.toMap
      val got = SparkEntry.queries("c39_dup_passage")(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == expected)
    }
  }

  /** Random bounded event streams with deliberate timestamp ties (grid
    * timestamps) — exercises the (us, event_id) tie-break in b44's
    * carry-forward windows.
    */
  private val genEvents: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(0, 120)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 4L)
      slot <- Gen.choose(0L, 60L) // hours on a grid => frequent ties
      typ <- Gen.oneOf("view", "click", "purchase", "signup")
    } yield (user, slot * 3600L * 1000000L, typ))
  } yield evs.zipWithIndex.map { case ((u, us, t), i) => (i.toLong, u, us, t) }

  test("b44 funnel matches a sequential replay on random event streams") {
    forAllN(genEvents, 8) { evs =>
      import spark.implicits._
      val dir = graft.util.TmpDir.fresh("fuzz-events")
      evs.map { case (id, u, us, t) => (id, us * 1000L, u, t, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val step = 86400L * 1000000L
      val expected = evs.filter(e => e._4 != "signup")
        .groupBy(_._2).toSeq.flatMap { case (user, rows) =>
          var lastView = -1L; var lastClick = -1L
          val conv = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.sortBy(r => (r._3, r._1)).foreach { case (_, _, us, typ) =>
            typ match {
              case "purchase" =>
                if (lastClick >= 0 && us - lastClick <= step) conv += us
              case "click" =>
                if (lastView >= 0 && us - lastView <= step) lastClick = us
              case _ => lastView = us
            }
          }
          if (conv.isEmpty) None
          else Some((user, conv.min, conv.length.toLong))
        }.sortBy(_._1)
      val got = SparkEntry.queries("b44_funnel_pattern")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"events=${evs.take(20)}...")
    }
  }

  test("c42/c45 on random corpora: strata smaller than k, holdout leakage replay") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // c42: min(20, |stratum|) per source by (md5, doc_id) rank — with
      // <= 25 docs over 20 sources every stratum is SMALLER than k
      val expHold = docs.groupBy { case (id, _) => "src" + (id % 20) }
        .flatMap { case (src, ds) =>
          ds.map(_._1).sortBy(id => (md5hex("hold:" + id), id)).take(20)
            .zipWithIndex.map { case (id, j) => (id, src, j + 1L) }
        }.toSeq.sortBy(t => (t._2, t._3))
      val gotHold = SparkEntry.queries("c42_eval_holdout")(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(gotHold == expHold)
      // c45 replay on the same corpus
      val holdIds = expHold.map(_._1).toSet
      val grams = docs.flatMap { case (id, t) =>
        val w = t.split(" ")
        if (w.length < 5) None
        else Some(id ->
          (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet)
      }.toMap
      val hg = grams.filter(t => holdIds(t._1)).values.flatten.toSet
      val expC45 = grams.filter(t => !holdIds(t._1)).map { case (id, gs) =>
        (id, gs.size.toLong, gs.count(hg).toLong, gs.exists(hg))
      }.toSeq.sortBy(_._1)
      val gotC45 =
        SparkEntry.queries("c45_holdout_decontaminate")(spark, d).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .toSeq
      assert(gotC45 == expC45)
    }
  }

  test("c53 bigram surprisal matches a driver-side recomputation on random corpora") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      val got = SparkEntry.queries("c53_lm_bigram")(spark, d).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val bigrams = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").sliding(2).filter(_.length == 2)
          .map(p => (i.toLong, p(0), p(1))).toList
      }
      val pc = bigrams.groupBy(b => (b._2, b._3)).view
        .mapValues(_.size.toLong).toMap
      val ctx = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def bits(w1: String, w2: String): Long =
        63L - java.lang.Long.numberOfLeadingZeros(ctx(w1) / pc((w1, w2)))
      val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
        val s = bs.map(b => bits(b._2, b._3)).sum
        id -> ((bs.size.toLong, s, s * 10000L / bs.size))
      }
      assert(got == expect)
      // single-word docs carry no bigram and must not appear
      texts.zipWithIndex.foreach { case (t, i) =>
        if (t.split(" ").length < 2) assert(!got.contains(i.toLong))
      }
    }
  }

  test("c52 degenerate shard: single distinct token yields a null slope, full head share") {
    val d = writeCorpus(List("a a a a a"))
    val rows = SparkEntry.queries("c52_zipf_stats")(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("source") == "src0")
    assert(r.getAs[Long]("n_distinct") == 1L)
    assert(r.getAs[Long]("n_total") == 5L)
    assert(r.getAs[Long]("top1_bp") == 10000L)
    // one point fits no line: the regression denominator is exactly 0
    assert(r.isNullAt(r.fieldIndex("zipf_slope")))
  }

  test("c30 kept counts match brute force (top-20 stop list, ties by term)") {
    forAllN(genCorpus, 5) { texts =>
      val d = writeCorpus(texts)
      val got = SparkEntry.queries("c30_stopword_filter")(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val all = texts.flatMap(_.split(" "))
      val stop = all.groupBy(identity).view.mapValues(_.length).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ")
        val expect = (toks.length.toLong, toks.count(!stop(_)).toLong)
        assert(got(i.toLong) == expect,
          s"doc $i '$t': ${got(i.toLong)} != $expect")
      }
    }
  }
}
