package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable

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

  test("b56: null-safe join matches the NULL bucket and stays on the equi-join path") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("b56_join_null_safe")(spark, sf0001)
    // must NOT degrade to a nested-loop join — `<=>` is an equi-key
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "null-safe join fell off the equi-join path")
    val rows = df.collect()
    // independent recomputation from the raw table
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang", $"source").as[(String, String)].collect()
    def key(l: String): Option[String] = if (l == "zh") None else Some(l)
    val allC = docs.groupBy(d => key(d._1)).view.mapValues(_.length).toMap
    val subC = docs.filter(d => Set("src1", "src2", "src3")(d._2))
      .groupBy(d => key(d._1)).view.mapValues(_.length).toMap
    val expected = allC.keySet.intersect(subC.keySet)
      .map(k => (k.orNull, allC(k).toLong, subC(k).toLong))
    val got = rows.map(r =>
      (r.getAs[String]("lang_k"), r.getAs[Long]("n_all"),
        r.getAs[Long]("n_sub"))).toSet
    assert(got == expected)
    // the semantic point: if zh docs exist in both sides, the NULL
    // bucket row must be present (standard equality would drop it)
    if (subC.contains(None)) {
      assert(rows.exists(_.isNullAt(0)), "NULL-key bucket missing")
    }
  }

  test("c60: funnel counts are monotone, stage-consistent, and tie to a recomputation") {
    val rows = graft.SparkEntry.queries("c60_filter_attrition")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    import spark.implicits._
    val raw = docs.select($"source", $"n_chars", $"text")
      .as[(String, Long, String)].collect()
    for ((src, rs) <- bySrc) {
      val sorted = rs.sortBy(_.getAs[Long]("stage"))
      assert(sorted.map(_.getAs[Long]("stage")).toSeq == (0L to 4L))
      val pass = sorted.map(_.getAs[Long]("n_pass"))
      // monotone non-increasing survivors; drops reconcile exactly
      pass.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => () }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("n_drop") ==
            a.getAs[Long]("n_pass") - b.getAs[Long]("n_pass"))
        case _ => ()
      }
      // stage 0 = all docs of the source; stage 4 = independent recount
      val mine = raw.filter(_._1 == src)
      assert(pass.head == mine.length.toLong)
      val surv = mine.count { case (_, nc, t) =>
        val w = t.split(" ")
        val ndw = w.distinct.length
        nc >= 100 && w.length >= 20 && nc <= w.length * 12L &&
          ndw * 10L >= w.length * 3L
      }
      assert(pass.last == surv.toLong)
    }
  }

  test("c61: tempered weights recompute exactly and express the alpha=0.5 tilt") {
    val rows = graft.SparkEntry.queries("c61_domain_mixture")(spark, sf0001)
      .collect().sortBy(_.getAs[String]("source"))
    assert(rows.nonEmpty)
    val n = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens"))
    val tot = n.map(_._2).sum
    // DECIMAL-summed global, then the same IEEE division as the op
    val totSq = n.map(t => BigDecimal(math.sqrt(t._2.toDouble))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    for (r <- rows) {
      val nt = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("share_bp") == 10000L * nt / tot)
      assert(r.getAs[Long]("weight_bp") ==
        math.floor(10000d * math.sqrt(nt.toDouble) / totSq).toLong)
    }
    // weights form a (floored) distribution and preserve size order
    val wsum = rows.map(_.getAs[Long]("weight_bp")).sum
    assert(wsum <= 10000L && wsum > 10000L - rows.length)
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens")).map(_.getAs[Long]("weight_bp"))
    byTok.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => () }
    // alpha<1 upweights small sources relative to their natural share
    val smallest = rows.minBy(_.getAs[Long]("n_tokens"))
    val largest = rows.maxBy(_.getAs[Long]("n_tokens"))
    if (smallest.getAs[Long]("n_tokens") < largest.getAs[Long]("n_tokens")) {
      assert(smallest.getAs[Long]("weight_bp") >= smallest.getAs[Long]("share_bp"))
      assert(largest.getAs[Long]("weight_bp") <= largest.getAs[Long]("share_bp"))
    }
  }

  test("b57: ALL-variant cardinalities obey exact multiset arithmetic") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("b57_set_ops_all")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey").as[Long].collect()
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").as[Long].collect()
    val oc = o.groupBy(identity).view.mapValues(_.length).toMap
    val cc = c.groupBy(identity).view.mapValues(_.length).toMap
    val inter = oc.map { case (k, n) => math.min(n, cc.getOrElse(k, 0)) }.sum
    val exc = oc.map { case (k, n) => math.max(0, n - cc.getOrElse(k, 0)) }.sum
    assert(rows("union_all") == o.length.toLong + c.length)
    assert(rows("intersect_all") == inter.toLong)
    assert(rows("except_all") == exc.toLong)
    // the semantic point vs b16: multiset counts exceed distinct counts
    assert(rows("intersect_all") >= oc.keySet.intersect(cc.keySet).size.toLong)
  }

  test("b58: windowed distinct count is exact and plans a single exchange") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("b58_window_count_distinct")(spark, sf0001)
    // both window ops share one partitioning: exactly ONE exchange below
    // the windows (the orderBy adds a final range exchange for output)
    val plan = df.queryExecution.executedPlan.toString
    val winExchanges = "Exchange hashpartitioning\\(l_orderkey".r
      .findAllIn(plan).length
    assert(winExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
    val rows = df.collect()
    val truth = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("nd_supp") == truth(r.getAs[Long]("l_orderkey")))
    }
  }

  test("b59: three-valued logic — poisoned NOT IN empties, clean recomputes exactly") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("b59_not_in_null_aware")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").as[Long].collect().toSet
    val ords = spark.read.parquet(s"$sf0001/orders.parquet")
    val recent = ords
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00")))
      .select($"o_custkey").as[Long].collect().toSet
    assert(rows("clean") == custs.diff(recent).size.toLong)
    // one NULL in the subquery → UNKNOWN for every row → empty result
    if (ords.head(1).nonEmpty) assert(rows("poisoned") == 0L)
  }

  test("c62: df exact, postings capped at 8, sorted, and a prefix of the true list") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("c62_inverted_index")(spark, sf0001)
      .collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val truth = docs.flatMap { case (id, t) => t.split(" ").distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(rows.length == truth.size)
    rows.foreach { r =>
      val term = r.getAs[String]("term")
      val posts = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      assert(posts.length <= 8)
      assert(posts == posts.sorted)
      assert(r.getAs[Long]("df") == truth(term).length.toLong)
      assert(posts == truth(term).take(8), s"term $term postings not the sorted prefix")
    }
    // the scale claim: the posting cap is pushed below the window sort
    // (stopword postings prune per task-partition, no unbounded
    // collect_list buffering)
    val plan = graft.SparkEntry.queries("c62_inverted_index")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "posting cap not pushed down as WindowGroupLimit")
  }

  test("b59: plans the null-aware anti join, not a rewrite") {
    // BroadcastHashJoinExec's trailing flag is isNullAwareAntiJoin;
    // the poisoned branch must carry it (Spark 4 plans single-column
    // NOT IN this way — if a future version rewrites differently the
    // semantics assert above still gates correctness)
    val plan = graft.SparkEntry.queries("b59_not_in_null_aware")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("LeftAnti, BuildRight, true".r.findAllIn(plan).nonEmpty,
      s"no null-aware anti join in plan:\n$plan")
  }

  private def md5long(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("b60: est-vs-true flags hold; exact moments match a BigInt recompute") {
    import spark.implicits._
    val rows = q("b60_agg_stats").collect()
    val base = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[(String, Double, Double)].collect()
    val grouped = base.groupBy(_._1)
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet == grouped.keySet)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok_sd") && r.getAs[Boolean]("ok_corr"),
        s"builtin moment drifted for ${r.getAs[String]("l_returnflag")}")
      val g = grouped(r.getAs[String]("l_returnflag"))
      val xs = g.map(t => BigInt(t._2.toLong))
      val ys = g.map(t => BigInt(math.floor(t._3 * 100).toLong))
      val n = BigInt(xs.length)
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      val (sy, syy) = (ys.sum, ys.map(y => y * y).sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sd = math.sqrt((n * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble)
      val co = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("sd_qty") - sd) < 1e-9)
      assert(math.abs(r.getAs[Double]("corr_qp") - co) < 1e-9)
    }
  }

  test("b61: version chains contiguous, sentinel-closed, exactly one current") {
    val rows = q("b61_scd2_dimension").collect()
    val byKey = rows.groupBy(_.getAs[Long]("key"))
    val nCust = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(byKey.size.toLong == nCust)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("valid_from"))
      val expVers = 1 + (if (k % 5 == 2) 1 else 0) + (if (k % 20 == 2) 1 else 0)
      assert(sorted.length == expVers, s"key $k version count")
      assert(sorted.head.getAs[Long]("valid_from") == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") + 1 ==
            b.getAs[Long]("valid_from"), s"key $k gap/overlap")
          assert(!a.getAs[Boolean]("is_current"))
        case _ => ()
      }
      assert(sorted.last.getAs[Long]("valid_to") == 9999L)
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
  }

  test("b62: buckets partition all rows, bounds tight, width_bucket agrees") {
    val rows = q("b62_histogram").collect()
    val nLi = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(rows.map(_.getAs[Long]("cnt")).sum == nLi)
    val bs = rows.map(_.getAs[Long]("bucket")).toSeq
    assert(bs == bs.sorted && bs.distinct.length == bs.length)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Boolean]("wb_ok"), s"width_bucket disagrees in bucket $b")
      assert(r.getAs[Long]("min_cents") >= b * 500000L)
      assert(r.getAs[Long]("max_cents") < (b + 1) * 500000L)
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
    }
  }

  test("c63: scores equal an independent model recompute; kept == score>0") {
    import spark.implicits._
    val rows = q("c63_quality_classifier").collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id).split(" ")
      val score = toks.map { w =>
        val fh = md5long("feat:" + w) % 64
        md5long("w:" + fh) % 2001 - 1000
      }.sum
      assert(r.getAs[Long]("n_tok") == toks.length.toLong)
      assert(r.getAs[Long]("score") == score, s"doc $id score")
      assert(r.getAs[Boolean]("kept") == (score > 0))
    }
  }

  test("c64: matrix equals an independent head-fingerprint recompute") {
    import spark.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = q("c64_cross_source_dup").collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text", $"source").as[(String, String)].collect()
    val fpSrc = docs.map { case (t, src) => (md5hex(t.take(200)), src) }.distinct
    val expected = fpSrc.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val got = rows.map(r => ((r.getAs[String]("source_a"),
      r.getAs[String]("source_b")), r.getAs[Long]("n_shared"))).toMap
    assert(rows.nonEmpty, "no cross-source duplication found at sf0.001")
    assert(got == expected)
  }

  test("a30: zstd codec actually lands on disk; parity with a snappy twin") {
    q("a30_sink_compressed").collect() // materialize the write
    val dir = new java.io.File(graft.util.TmpDir.path("a30_sink_zstd"))
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach(f => assert(f.getName.contains(".zstd."),
      s"${f.getName} not zstd-compressed"))
    val snap = graft.util.TmpDir.path("a30_twin_snappy")
    spark.read.parquet(s"$sf0001/part.parquet")
      .write.mode("overwrite").option("compression", "snappy").parquet(snap)
    val a = q("a30_sink_compressed")
    val b = spark.read.parquet(snap)
      .select("p_partkey", "p_name", "p_retailprice")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "zstd and snappy round-trips disagree")
  }

  test("b63: recursion depth/levels/ancestor-sum match closed forms") {
    val rows = q("b63_recursive_cte").collect()
    val nCust = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(rows.length.toLong == nCust)
    rows.foreach { r =>
      val k = r.getAs[Long]("key")
      // floor(log2 k); key 0 (custkeys are 0-based) never recurses —
      // base row only, depth 0
      val depth =
        if (k == 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(k)
      assert(r.getAs[Long]("depth_to_root") == depth, s"key $k depth")
      assert(r.getAs[Long]("n_levels") == depth + 1, s"key $k levels")
      var (anc, sum) = (k, 0L)
      while (anc >= 1) { sum += anc; if (anc == 1) anc = 0 else anc /= 2 }
      assert(r.getAs[Long]("anc_sum") == sum, s"key $k ancestor sum")
    }
  }

  test("c65: recall consistency + independent bucket/GT recompute") {
    import spark.implicits._
    val rows = q("c65_ann_recall_eval").collect()
    assert(rows.nonEmpty)
    // independent candidate sets: recompute every vector's sign-LSH
    // bucket on the driver from the raw floats
    val planes = TierC.lshPlanes(8, 64)
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val bucketOf = embs.map { case (id, e) =>
      val qv = e.map(v => math.floor(v.toDouble * 1024.0).toLong)
      var b = 0L
      for (p <- planes.indices) {
        var dot = 0L
        for (j <- qv.indices) dot += planes(p)(j) * qv(j)
        if (dot >= 0L) b |= (1L << p)
      }
      id -> b
    }.toMap
    val byBucket = bucketOf.groupBy(_._2).view.mapValues(_.keySet).toMap
    // ground truth from the already-oracled c3 output
    val gt = q("c3_similarity_topk").collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val cands = byBucket(bucketOf(p)) - p
      assert(r.getAs[Long]("n_cand") == cands.size.toLong, s"probe $p cands")
      val hits = (gt.getOrElse(p, Set.empty[Long]) & cands).size.toLong
      assert(r.getAs[Long]("n_hit") == hits, s"probe $p hits")
      assert(r.getAs[Long]("recall_bp") == hits * 2000)
      assert(hits <= 5 && r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    }
  }

  test("d21: verdicts equal batch LSH dedup; cross-batch collisions exercised") {
    import spark.implicits._
    val rows = q("d21_stream_lsh_dedup").collect()
    assert(rows.nonEmpty)
    // batch recompute with the SAME kernel: winner per bucket = min doc_id
    val sigs = TierC.minhashSignatures(spark,
        spark.read.parquet(s"$sf0001/documents.parquet"))
      .select($"doc_id", $"band", $"minhash").as[(Long, Long, String)]
      .collect()
    val winner = sigs.groupBy(r => (r._2, r._3))
      .view.mapValues(_.map(_._1).min).toMap
    val perDoc = sigs.groupBy(_._1)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bands = perDoc(id)
      val dup = bands.count { case (doc, b, sg) => winner((b, sg)) != doc }
      assert(r.getAs[Long]("n_bands") == bands.length.toLong, s"doc $id bands")
      assert(r.getAs[Long]("n_dup_bands") == dup.toLong, s"doc $id dups")
      assert(r.getAs[Boolean]("kept") == (dup == 0))
    }
    assert(rows.length == perDoc.size)
    // the streaming-specific claim: at least one bucket is claimed in an
    // earlier id-range half and collided in the LATER half, so the
    // verdict genuinely crossed a microbatch boundary through state
    // (the source is writeRangedHalves — 2 id-ranged files)
    val ids = perDoc.keySet
    val (lo, hi) = (ids.min, ids.max)
    val span = hi - lo + 1
    def half(id: Long): Long = (id - lo) * 2 / span
    val crossBatch = sigs.exists { case (doc, b, sg) =>
      winner((b, sg)) != doc && half(winner((b, sg))) < half(doc)
    }
    assert(crossBatch, "no cross-batch LSH collision at sf0.001 — the " +
      "multi-batch state continuity claim is untested at this SF")
  }

  test("a31: nested schema prunes to the selected leaves; filter pushes down") {
    val df = q("a31_source_nested")
    val plan = df.queryExecution.executedPlan.toString
    // content.text must never reach the scan's ReadSchema
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("meta"), s"no nested read schema in: $read")
    assert(!read.contains("text") && !read.contains("content"),
      s"content struct not pruned: $read")
    assert(!read.contains("source:"), s"unselected meta leaf not pruned: $read")
    assert(plan.contains("PushedFilters") && plan.contains("meta.lang"),
      "nested predicate did not push down")
    // value parity with the flat read
    val flat = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("lang") === "en").select("doc_id", "lang", "n_chars")
    assert(df.exceptAll(flat).isEmpty && flat.exceptAll(df).isEmpty)
  }

  test("a32: real XML row tags land on disk; round-trip is lossless") {
    val df = q("a32_source_xml")
    val flat = spark.read.parquet(s"$sf0001/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(df.exceptAll(flat).isEmpty && flat.exceptAll(df).isEmpty)
    val dir = new java.io.File(graft.util.TmpDir.path("a32_sink_xml"))
    val xmlFiles = dir.listFiles().filter(_.getName.endsWith(".xml"))
    assert(xmlFiles.nonEmpty, "no .xml part files written")
    // concatenate ALL parts (an empty input partition writes a row-less
    // part file, and listFiles order is arbitrary) and close the handles
    val content = xmlFiles.map { f =>
      val src = scala.io.Source.fromFile(f)("UTF-8")
      try src.mkString finally src.close()
    }.mkString
    assert(content.contains("<nation>") && content.contains("</nation>"),
      "rowTag framing missing from the written XML")
    assert(content.contains("<n_nationkey>"), "field tags missing")
  }

  test("a33: binary files round-trip with path metadata and raw payload") {
    import spark.implicits._
    val rows = q("a33_source_binary_files").collect()
    val names = spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap
    assert(rows.length == names.size)
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map("%02x".format(_)).mkString
    rows.foreach { r =>
      val k = r.getAs[Int]("n_nationkey")
      assert(r.getAs[Long]("length") ==
        names(k).getBytes("UTF-8").length.toLong)
      assert(r.getAs[String]("content_fp") ==
        md5hex(names(k).getBytes("UTF-8")))
    }
  }

  test("b70: dynamic gap genuinely changes sessionization; ends are max(ts+gap)") {
    import spark.implicits._
    val rows = q("b70_session_dynamic_gap").collect()
    // through Tables.events — the ONLY sanctioned events reader (the
    // raw file is TIMESTAMP_NTZ since round 5; the canary's rule)
    val ev = graft.util.Tables.events(spark, sf0001)
      .select($"user_id", expr("unix_micros(ts)").as("us"),
        $"event_type", $"event_id")
      .as[(Long, Long, String, Long)].collect()
    // independent recompute with the running-max-end rule
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._4))
      val sessions = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Long, Long, String, Long)]]
      var maxEnd = Long.MinValue
      sorted.foreach { e =>
        val gap = if (e._3 == "error") 300000000L else 1800000000L
        if (e._2 > maxEnd) sessions += mutable.ArrayBuffer(e)
        else sessions.last += e
        maxEnd = math.max(maxEnd, e._2 + gap)
      }
      sessions.map { ss =>
        val ends = ss.map(e =>
          e._2 + (if (e._3 == "error") 300000000L else 1800000000L))
        ((u, ss.head._2 / 1000000L),
          (ends.max / 1000000L, ss.length.toLong,
            ss.count(_._3 == "error").toLong))
      }
    }.toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"))
      val (endS, cnt, nErr) = expected(key)
      assert(r.getAs[Long]("end_s") == endS, s"session $key end")
      assert(r.getAs[Long]("cnt") == cnt, s"session $key count")
      assert(r.getAs[Long]("n_errors") == nErr, s"session $key errors")
    }
    // the dynamic gap must actually bite: at least one session closed
    // by the 5-minute error patience (shorter than any fixed-30min one)
    assert(rows.exists(r => r.getAs[Long]("n_errors") > 0 &&
      r.getAs[Long]("end_s") - r.getAs[Long]("start_s") < 1800),
      "no error-shortened session at sf0.001 — dynamic gap untested")
  }

  test("memo eviction path genuinely releases localCheckpoint blocks") {
    // Dataset.unpersist is a CacheManager call and ignores
    // localCheckpoint storage — the eviction hook must unpersist the
    // LogicalRDD's underlying RDD; prove that extraction works
    val df = spark.range(100).toDF("x").localCheckpoint(false)
    df.count(): Unit
    val lr = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(lr.isDefined, "no LogicalRDD under a localCheckpointed Dataset")
    assert(lr.get.rdd.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "checkpointed RDD not persisted — premise broken")
    lr.get.rdd.unpersist(false)
    assert(lr.get.rdd.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "unpersist on the LogicalRDD's rdd did not release storage")
  }

  test("b64: winners attain the true extremes and are unique by construction") {
    import spark.implicits._
    val rows = q("b64_agg_argminmax").collect()
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber".cast("long"),
        $"l_extendedprice")
      .as[(String, Long, Long, Double)].collect()
    val grouped = li.groupBy(_._1)
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet == grouped.keySet)
    rows.foreach { r =>
      val g = grouped(r.getAs[String]("l_returnflag"))
      val keyed = g.map { case (_, ok, ln, p) =>
        val cents = math.floor(p * 100).toLong
        (BigInt(cents) * BigInt(2).pow(50) + (ok * 8 + ln), ok, ln, cents)
      }
      val cheap = keyed.minBy(_._1)
      val dear = keyed.maxBy(_._1)
      assert(keyed.map(_._1).distinct.length == keyed.length, "composite not unique")
      assert(r.getAs[Long]("cheap_ok") == cheap._2 &&
        r.getAs[Long]("cheap_ln") == cheap._3 &&
        r.getAs[Long]("cheap_cents") == cheap._4)
      assert(r.getAs[Long]("dear_ok") == dear._2 &&
        r.getAs[Long]("dear_ln") == dear._3 &&
        r.getAs[Long]("dear_cents") == dear._4)
      // the identity the decode-free output leans on: the argmin/argmax
      // row's cents ARE the group's plain min/max (cents is the
      // composite's primary key)
      assert(cheap._4 == g.map(t => math.floor(t._4 * 100).toLong).min)
      assert(dear._4 == g.map(t => math.floor(t._4 * 100).toLong).max)
    }
  }

  test("round-8 plan shapes: single-exchange aggs, broadcast model serving") {
    def plan(name: String): String =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
    def hashExchanges(p: String): Int =
      "Exchange hashpartitioning".r.findAllIn(p).length
    // b60/b62/c66: one hash exchange (the groupBy); the only other
    // exchange is the presentation ORDER BY's range partitioning
    assert(hashExchanges(plan("b60_agg_stats")) == 1, "b60 extra shuffle")
    assert(hashExchanges(plan("b62_histogram")) == 1, "b62 extra shuffle")
    assert(hashExchanges(plan("c66_shard_manifest")) == 1, "c66 extra shuffle")
    // b61: the lead() window is the single hash-partitioned exchange
    assert(hashExchanges(plan("b61_scd2_dimension")) == 1, "b61 extra shuffle")
    // c63: the weight table must ship as a broadcast, never shuffle the
    // token stream on the feature key
    val c63p = plan("c63_quality_classifier")
    assert(c63p.contains("BroadcastHashJoin"), "c63 model not broadcast")
    assert(hashExchanges(c63p) == 1, "c63 token stream shuffled beyond doc agg")
  }

  test("b66: ANSI default is strict; try_* nulls exactly the dirty rows") {
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "ANSI default not on — the operator's premise is void")
    val rows = q("b66_ansi_try").collect()
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_discount")
      .as[(Long, Int, Double)].collect()
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == li.length.toLong)
    // ÷0 branch genuinely exercised, and counts match the data
    val divOk = rows.map(_.getAs[Long]("n_div_ok")).sum
    assert(divOk == li.count(t => math.floor(t._3 * 100) != 0).toLong)
    assert(divOk < total, "no zero-discount rows — ÷0 branch untested")
    // poisoned cast: exactly the non-line-1 rows parse
    assert(rows.map(_.getAs[Long]("n_parsed")).sum ==
      li.count(_._2 != 1).toLong)
    // overflow: only orderkey == 0 survives try_add(MaxValue, k)
    assert(rows.map(_.getAs[Long]("n_no_overflow")).sum ==
      li.count(_._1 == 0L).toLong)
    // and the strict form REALLY fails on the same data — the premise
    val strict = scala.util.Try {
      spark.read.parquet(s"$sf0001/lineitem.parquet")
        .selectExpr(
          "floor(l_extendedprice * 100) div floor(l_discount * 100) AS x")
        .agg(sum("x")).collect()
    }
    assert(strict.isFailure, "ANSI strict division did not fail on ÷0")
  }

  test("b67: variant decode-once semantics match a JVM recompute") {
    import spark.implicits._
    val rows = q("b67_variant_json").collect()
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_id", $"event_type", $"props")
      .as[(Long, String, String)].collect()
    val byType = ev.groupBy(_._2)
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    rows.foreach { r =>
      val g = byType(r.getAs[String]("event_type"))
      val bad = g.count(_._1 % 3 == 0)
      val ks = g.filter(_._1 % 3 != 0)
        .map(t => """-?\d+""".r.findFirstIn(t._3).get.toLong)
      assert(r.getAs[Long]("n_rows") == g.length.toLong)
      assert(r.getAs[Long]("n_unparsed") == bad.toLong)
      assert(r.getAs[Long]("n_k") == ks.length.toLong)
      assert(r.getAs[Long]("k_sum") == ks.sum)
    }
  }

  test("b68: collated join matches lower()-rewrite; corpus premise pinned") {
    import spark.implicits._
    val langs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang").distinct().as[String].collect()
    // the oracle equates collated equality with lower() only because
    // the dimension is lowercase — if the corpus ever gains mixed-case
    // lang codes this must fail loudly, not drift
    assert(langs.forall(l => l == l.toLowerCase), s"mixed-case langs: ${langs.toSeq}")
    val rows = q("b68_collation_join").collect()
    assert(rows.map(_.getAs[Long]("n_matched")).sum ==
      spark.read.parquet(s"$sf0001/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_casings") >= 1 && r.getAs[Long]("n_casings") <= 3)
    }
  }

  test("b69: bound parameters push down like literals; AQE is live") {
    val df = q("b69_sql_parameterized")
    val plan = df.queryExecution.executedPlan.toString
    // the bound :minPrice must reach the scan as an ordinary pushed filter
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_totalprice,50000"),
      s"bound parameter not pushed to the scan:\n$plan")
    // and the session genuinely runs AQE (the skew/coalesce safety net
    // every SURVEY scale claim leans on): executed plans are adaptive
    assert(df.queryExecution.executedPlan.getClass.getSimpleName
      .contains("AdaptiveSparkPlan"),
      "AQE not active in the session")
  }

  test("b65: observed metrics equal an aggregate of the landed sink") {
    val row = q("b65_observe_metrics").collect().head
    val sink = spark.read.parquet(graft.util.TmpDir.path("b65_observed_sink"))
    val agg = sink.agg(count(lit(1)), sum("cents"), max("cents")).collect().head
    assert(row.getAs[Long]("n_rows") == agg.getLong(0))
    assert(row.getAs[Long]("rev_cents") == agg.getLong(1))
    assert(row.getAs[Long]("max_cents") == agg.getLong(2))
    assert(row.getAs[Long]("n_rows") > 0)
  }

  test("c66: manifest matches an order-scrambled driver recompute") {
    import spark.implicits._
    val rows = q("c66_shard_manifest").collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)].collect()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // scramble the fold order deliberately: XOR must not care
    val scrambled = docs.sortBy(t => md5hex("scramble:" + t._1))
    val byShard = scrambled.groupBy(t => md5long("shard:" + t._1) % 8)
    assert(rows.length == byShard.size)
    rows.foreach { r =>
      val g = byShard(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("bytes") == g.map(_._3).sum)
      assert(r.getAs[Long]("min_doc") == g.map(_._1).min)
      assert(r.getAs[Long]("max_doc") == g.map(_._1).max)
      val fp = g.map(t => md5long("doc:" + md5hex(t._2))).reduce(_ ^ _)
      assert(r.getAs[Long]("content_fp") == fp, s"shard ${r.getAs[Long]("shard")} fp")
    }
  }
}
