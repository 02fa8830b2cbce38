package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the round-7 additions (c56 frame sampling, d20
  * streaming curation gate) beyond the blanket smoke/oracle gates.
  */
class Round7PropsSpec extends SparkSpec {
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("c56: 4 frames per doc, offsets on the stride grid, features recomputable") {
    import spark.implicits._
    val rows = q("c56_frame_sample").collect()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // every corpus doc is ≥4 bytes, so all 4 frames must exist
    assert(rows.length == texts.size * 4)
    rows.foreach { r =>
      val bytes = texts(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      val k = r.getAs[Long]("frame_idx")
      val stride = math.max(1, bytes.length / 4)
      val off = r.getAs[Long]("frame_off")
      assert(k >= 0 && k < 4)
      assert(off == k * stride)
      val len = r.getAs[Long]("frame_len")
      assert(len == math.min(8, bytes.length - off))
      assert(r.getAs[Int]("feat0") == (bytes(off.toInt) & 0xff))
      val sum = (off.toInt until (off + len).toInt)
        .map(i => (bytes(i) & 0xff).toLong).sum
      assert(r.getAs[Long]("feat_sum") == sum)
    }
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
