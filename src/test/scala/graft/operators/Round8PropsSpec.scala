package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the round-8 additions (c58 maximal dup spans,
  * c59 compaction execution) beyond the blanket smoke/oracle gates.
  */
class Round8PropsSpec extends SparkSpec {
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("c58: spans are maximal, disjoint, >=5 words, and genuinely duplicated") {
    import spark.implicits._
    val spans = q("c58_dup_spans").collect()
    assert(spans.nonEmpty)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val words = texts.map { case (id, t) => id -> t.split(" ") }
    // recompute the duplicated-gram set independently (cross-doc >=2)
    val n = 5
    val gramDocs = scala.collection.mutable.Map[String, Set[Long]]()
    for ((id, w) <- words; i <- 0 to w.length - n if w.length >= n) {
      val g = w.slice(i, i + n).mkString(" ")
      gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
    }
    def dupAt(id: Long, p: Int): Boolean = {
      val w = words(id)
      p >= 0 && p <= w.length - n &&
        gramDocs(w.slice(p, p + n).mkString(" ")).size >= 2
    }
    val byDoc = spans.groupBy(_.getAs[Long]("doc_id"))
    for ((id, ss) <- byDoc) {
      val sorted = ss.sortBy(_.getAs[Long]("span_start"))
      var prevEnd = -2L // st=0 with no predecessor must pass st > prevEnd+1
      for (r <- sorted) {
        val st = r.getAs[Long]("span_start")
        val en = r.getAs[Long]("span_end")
        assert(r.getAs[Long]("span_words") == en - st + 1)
        assert(en - st + 1 >= n)
        // strictly disjoint, non-touching word coverage (touching or
        // overlapping seed intervals merge into one island by the
        // gap<=n rule)
        assert(st > prevEnd + 1, s"doc $id spans overlap/touch")
        prevEnd = en
        // the span is exactly the union of its duplicated seed
        // intervals: seeds exist at both edges, every covered word is
        // within n-1 of a seed (no internal coverage gap)
        val seeds = (st to en - n + 1).filter(p => dupAt(id, p.toInt))
        assert(seeds.nonEmpty && seeds.head == st,
          s"doc $id span at $st does not start on a duplicated seed")
        assert(seeds.last == en - n + 1,
          s"doc $id span to $en does not end on a duplicated seed")
        seeds.sliding(2).foreach {
          case Seq(a, b) => assert(b - a <= n,
            s"doc $id span [$st,$en] has a coverage gap between seeds $a and $b")
          case _ => ()
        }
        // MAXIMAL: no duplicated seed within merge distance outside
        ((st - n) to (st - 1)).foreach(q =>
          assert(!dupAt(id, q.toInt), s"doc $id span at $st not left-maximal"))
        ((en - n + 2) to (en + 1)).foreach(q =>
          assert(!dupAt(id, q.toInt), s"doc $id span to $en not right-maximal"))
      }
    }
  }

  test("c59: exactly one file per group, read-back parity, bytes consistent") {
    val manifest = q("c59_compaction_exec").collect()
    assert(manifest.nonEmpty)
    // one physical file per planned group — the small-files fix itself
    assert(manifest.forall(_.getAs[Long]("files_out") == 1L))
    val outDir = new java.io.File(graft.util.TmpDir.path("c59_compacted"))
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    assert(parquetFiles(outDir).size == manifest.length,
      "on-disk parquet file count != number of planned groups")
    // row-level read-back parity: the rewrite lost and invented nothing
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val back = spark.read.parquet(outDir.getAbsolutePath)
      .select(docs.columns.map(col).toIndexedSeq: _*)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // manifest bytes tie back to the source table exactly
    val totalBytes = manifest.map(_.getAs[Long]("bytes")).sum
    val srcBytes = docs.agg(sum("n_chars")).head.getLong(0)
    assert(totalBytes == srcBytes)
  }
}
