package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the round-7 additions (c56 frame sampling, d20
  * streaming curation gate) beyond the blanket smoke/oracle gates.
  */
class Round7PropsSpec extends SparkSpec {
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("c56: frames per doc, offsets on the stride grid, features recomputable") {
    import spark.implicits._
    val rows = q("c56_frame_sample").collect()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // Frame arithmetic runs on the DECODED codepoint stream (not raw
    // bytes), and frames per doc derive from each doc's own length
    // (k in 0..3 with k*stride < n) — no hardwired "every doc ≥4
    // units" assumption, per the repo's probe-don't-hardwire policy
    // for the volatile corpus.
    def cps(t: String): Array[Int] = t.codePoints().toArray
    val expectedFrames = texts.values.map { t =>
      val n = cps(t).length
      val stride = math.max(1, n / 4)
      (0 until 4).count(k => k.toLong * stride < n)
    }.sum
    assert(rows.length == expectedFrames)
    rows.foreach { r =>
      val c = cps(texts(r.getAs[Long]("doc_id")))
      val k = r.getAs[Long]("frame_idx")
      val stride = math.max(1, c.length / 4)
      val off = r.getAs[Long]("frame_off")
      assert(k >= 0 && k < 4)
      assert(off == k * stride)
      val len = r.getAs[Long]("frame_len")
      assert(len == math.min(8, c.length - off))
      assert(r.getAs[Int]("feat0") == c(off.toInt))
      val sum = (off.toInt until (off + len).toInt).map(i => c(i).toLong).sum
      assert(r.getAs[Long]("feat_sum") == sum)
    }
  }

  test("a28: merged read null-fills old-generation rows, keeps new intact") {
    val out = q("a28_source_evolving").collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.length == docs)
    out.foreach { r =>
      val even = r.getAs[Long]("doc_id") % 2 == 0
      // generation 1 (even ids) was written without n_chars
      assert(r.isNullAt(r.fieldIndex("n_chars")) == even)
      assert(!r.isNullAt(r.fieldIndex("lang")))
    }
  }

  test("c57: groups partition the manifest, sizes consistent, packing greedy") {
    import spark.implicits._
    val rows = q("c57_compaction_plan").collect()
    val manifest = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"source", $"doc_id", $"n_chars").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    // per source: group file counts sum to the file count, bytes to the
    // total, id ranges are disjoint and ordered
    manifest.foreach { case (src, files) =>
      val gs = rows.filter(_.getAs[String]("source") == src)
        .sortBy(_.getAs[Long]("grp"))
      assert(gs.map(_.getAs[Long]("n_files")).sum == files.length)
      assert(gs.map(_.getAs[Long]("bytes")).sum == files.map(_._3).sum)
      gs.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("last_doc") < y.getAs[Long]("first_doc"))
        case _ => ()
      }
      // greedy invariant: every group except the last begins before its
      // target boundary (cum_before div target defines it), so no group
      // besides the final one can be empty-undersized by construction;
      // spot-check: bytes of any non-final group ≥ target - max file size
      val target = 8192L
      val maxFile = files.map(_._3).max
      gs.dropRight(1).foreach { g =>
        assert(g.getAs[Long]("bytes") + maxFile >= target,
          s"$src grp ${g.getAs[Long]("grp")} undersized")
      }
    }
  }

  test("a29: corrupt lines are present in the sink and dropped by the parse") {
    val out = q("a29_source_malformed").collect()
    val nations = spark.read.parquet(s"$sf0001/nation.parquet").count()
    assert(out.length == nations)
    assert(out.forall(!_.anyNull))
    // the drop must be proven, not vacuous: the raw sink really does
    // contain the corrupt siblings, and a PERMISSIVE read sees them.
    // TmpDir.fresh was used, so locate the latest a29 dir.
    val base = new java.io.File(graft.util.TmpDir.base)
    val dirs = base.listFiles().filter(_.getName.startsWith("a29_source_malformed"))
    assert(dirs.nonEmpty)
    val latest = dirs.maxBy(_.lastModified).getAbsolutePath
    val rawCount = spark.read.text(latest).count()
    assert(rawCount > nations, s"no corrupt lines in sink ($rawCount)")
    val permissive = spark.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("mode", "PERMISSIVE").csv(latest).count()
    assert(permissive == rawCount)
    // the DROP relies ENTIRELY on the key failing INT conversion —
    // Spark CSV null-pads/truncates arity mismatches rather than
    // flagging them malformed. Pin that the corrupt lines' first
    // token is non-numeric, so a future edit that "fixes" the key
    // while keeping only the arity defect fails here instead of
    // silently turning a29 into a no-op.
    import spark.implicits._
    val corrupt = spark.read.text(latest).as[String].collect()
      .filterNot(l => l.split(",", -1).headOption.exists(_.matches("-?\\d+")))
    assert(corrupt.nonEmpty)
    assert(corrupt.forall(_.split(",", -1).head.toIntOption.isEmpty))
  }

  test("d20: stream output == batch gate; pass and reject sets both nonempty") {
    val out = q("d20_stream_curation_gate")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val batch = docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("stop_cnt",
        size(expr("filter(w, x -> x IN ('the','a','of','and','to'))"))
          .cast("long"))
      .filter(col("n_words") >= 10 &&
        expr("stop_cnt * 10000 div n_words") >= 200)
      .select("doc_id", "lang", "n_words", "stop_cnt")
    assert(out.count() == batch.count())
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
    // the gate must do real work: some docs rejected, most retained
    val total = docs.count()
    assert(out.count() > 0 && out.count() < total)
  }
}
