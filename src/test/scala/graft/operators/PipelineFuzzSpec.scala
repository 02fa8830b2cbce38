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
