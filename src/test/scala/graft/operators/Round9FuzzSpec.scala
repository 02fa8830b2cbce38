package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Multi-byte corpus fuzz for the two binary-decode kernels (c16, c56).
  *
  * Round 8 made both kernels decode UTF-8 bytes → codepoints so their
  * features are encoding-independent, but every fixture corpus the
  * driver generates is ASCII — the multi-byte path (2-byte Latin,
  * 3-byte CJK, 4-byte emoji = UTF-16 surrogate pairs) had never been
  * FED, only reasoned about. This fuzz generates mixed-script corpora,
  * writes them as a real parquet documents table, runs the DECLARED
  * queries against that dir, and checks every output cell against an
  * independent reimplementation that walks `codePointAt`/`charCount`
  * (not `codePoints()`, the kernels' route) and derives byte lengths
  * from the UTF-8 width formula (not from the encoded array) — so a
  * surrogate-pair or byte/char conflation bug in either kernel or in
  * the reference cannot cancel out.
  */
class Round9FuzzSpec extends SparkSpec {

  /** Codepoint pool spanning all four UTF-8 widths. */
  private val cpPool: Seq[Int] = Seq(
    'a'.toInt, 'Z'.toInt, '0'.toInt, ' '.toInt, // 1-byte ASCII
    0xE9, 0xFC, 0x3B1, // 2-byte: é ü α
    0x4E2D, 0x6587, 0x65E5, 0x672C, 0x3042, // 3-byte CJK/kana: 中文日本あ
    0x1F600, 0x1F680, 0x10348, 0x1D11E) // 4-byte: 😀 🚀 𐍈 𝄞

  private def utf8Width(cp: Int): Long =
    if (cp < 0x80) 1L else if (cp < 0x800) 2L
    else if (cp < 0x10000) 3L else 4L

  /** Independent decode: walk UTF-16 chars via codePointAt/charCount. */
  private def decode(sIn: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < sIn.length) {
      val cp = sIn.codePointAt(i)
      out += cp
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private val genDoc: Gen[String] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.const(1),
      2 -> Gen.choose(2, 15), 2 -> Gen.const(16), 4 -> Gen.choose(17, 60))
    cps <- Gen.listOfN(n, Gen.oneOf(cpPool))
  } yield cps.map(Character.toChars(_).mkString).mkString

  /** One fuzz corpus on disk per run, shaped like the driver's
    * documents table (doc_id, text, lang, source, n_chars); fresh dir
    * per corpus so the Tables memo's immutability contract holds.
    */
  private def writeCorpus(docs: Seq[String]): String = {
    import spark.implicits._
    val dir = graft.util.TmpDir.fresh("fuzz9-corpus")
    docs.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "xx", "fuzz", t.codePointCount(0, t.length).toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("c16 fuzz: decoded-codepoint features exact on mixed-width UTF-8") {
    val gen = for {
      k <- Gen.choose(1, 12)
      docs <- Gen.listOfN(k, genDoc)
    } yield docs
    forAllN(gen, 8) { docs =>
      val dir = writeCorpus(docs)
      val got = graft.SparkEntry.queries("c16_multimodal_binary")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2), r.getLong(3)))
      val expect = docs.zipWithIndex.map { case (t, i) =>
        val cps = decode(t)
        val nBytes = cps.map(utf8Width).sum
        val cp0 = if (cps.nonEmpty) cps(0) else -1
        val headSum = cps.take(16).map(_.toLong).sum
        (i.toLong, nBytes, cp0, headSum)
      }
      assert(got.toSeq == expect)
    }
  }

  test("c56 fuzz: frame offsets/features are codepoint-exact on mixed-width UTF-8") {
    val nFrames = 4
    val headLen = 8
    val gen = for {
      k <- Gen.choose(1, 10)
      docs <- Gen.listOfN(k, genDoc)
    } yield docs
    forAllN(gen, 8) { docs =>
      val dir = writeCorpus(docs)
      val got = graft.SparkEntry.queries("c56_frame_sample")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getInt(4), r.getLong(5)))
      val expect = docs.zipWithIndex.flatMap { case (t, id) =>
        val cps = decode(t)
        val n = cps.length
        val stride = math.max(1, n / nFrames)
        (0 until nFrames).filter(k => k * stride < n).map { k =>
          val off = k * stride
          val len = math.min(headLen, n - off)
          val sum = (off until off + len).map(cps(_).toLong).sum
          (id.toLong, k.toLong, off.toLong, len.toLong, cps(off), sum)
        }
      }
      assert(got.toSeq == expect)
      // multi-byte really exercised: some doc must contain a 4-byte cp
      // (frequency of the pool makes this near-certain at these sizes;
      // if every doc came out ASCII the run proves nothing — regenerate)
    }
  }

  test("c67 fuzz: BM25 matches the replay on adversarial corpora") {
    // edge shapes the fixture corpus never exhibits: vocab smaller
    // than the query band (ranks 11-13 empty ⇒ empty result), docs of
    // one repeated token (tf == dl), single-doc corpora (idf bits of
    // N/df = 0 ⇒ zero scores), empty docs (split(" ") still yields
    // one empty-string token — pinned HERE so both engines agree)
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll", "mm", "nn", "oo", "pp")
    val genDocW = for {
      n <- Gen.frequency(1 -> Gen.const(0), 2 -> Gen.const(1),
        4 -> Gen.choose(2, 30))
      uniform <- Gen.oneOf(true, false)
      w <- word
      ws <- Gen.listOfN(n, word)
    } yield (if (uniform) List.fill(n)(w) else ws).mkString(" ")
    val gen = for {
      k <- Gen.choose(1, 8)
      docs <- Gen.listOfN(k, genDocW)
    } yield docs
    forAllN(gen, 10) { docs =>
      val dir = writeCorpus(docs)
      val got = graft.SparkEntry.queries("c67_bm25")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      // from-scratch replay (split-on-space, the corpus contract)
      val tok = docs.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ", -1).map(w => (i.toLong, w))
      }
      val dl = tok.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val n = docs.length.toLong
      val stot = tok.length.toLong
      val a10k = math.max(1L, 10000L * stot / math.max(1L, n))
      val dfm = tok.distinct.groupBy(_._2).view.mapValues(_.length.toLong)
      val terms = dfm.toSeq.sortBy { case (w, df) => (-df, w) }
        .slice(10, 13).toMap
      def bits(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val expect = tok.filter(t => terms.contains(t._2))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .map { case ((id, w), tf) =>
          (id, (bits(n / terms(w)) * 220000000L * tf) /
            (10000L * tf + 3000L + (90000000L * dl(id)) / a10k))
        }
        .groupBy(_._1).view
        .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toSeq
        .map { case (id, (nh, sc)) => (id, nh, sc) }
        .sortBy { case (id, _, sc) => (-sc, id) }.take(10)
      assert(got == expect, s"docs=$docs\ngot=$got\nexp=$expect")
    }
  }

  test("c68 fuzz: NFC folding on generated multi-script docs") {
    val gen = for {
      k <- Gen.choose(1, 6)
      docs <- Gen.listOfN(k, genDoc)
    } yield docs
    forAllN(gen, 6) { docs =>
      val dir = writeCorpus(docs)
      val rows = graft.SparkEntry.queries("c68_dedup_nfc")(spark, dir)
        .collect()
      assert(rows.length == docs.length)
      rows.foreach { r =>
        // generated docs may themselves contain combining sequences
        // whose NFC differs from the raw bytes — but the two injected
        // prefixes ALWAYS split raw and ALWAYS fold normalized
        assert(r.getAs[Long]("n_raw") == 2L)
        assert(r.getAs[Long]("n_norm") == 1L)
        val t = docs(r.getLong(0).toInt)
        val md = java.security.MessageDigest.getInstance("MD5")
        val expect = java.text.Normalizer.normalize(
          "café " + t, java.text.Normalizer.Form.NFC)
        val fp = md.digest(expect.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(r.getAs[String]("norm_fp") == fp)
      }
    }
  }

  test("fuzz corpus generator emits all four UTF-8 widths") {
    // meta-check: the pool × generator actually covers widths 1-4, so
    // the two kernel fuzzes above can't silently degenerate to ASCII
    val widths = cpPool.map(utf8Width).toSet
    assert(widths == Set(1L, 2L, 3L, 4L))
    val sample = (1 to 20).flatMap { i =>
      genDoc.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).toSeq
    }.mkString
    assert(decode(sample).map(utf8Width).toSet == Set(1L, 2L, 3L, 4L))
  }
}
