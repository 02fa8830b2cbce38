package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Tier A semantics on tiny in-memory data (SURVEY §5.2 #2/#3):
  * the Mrs dataflow contracts — mapper multiplicity, reducer grouping,
  * reducemap ≡ reduce∘map fusion, partitioner invariants.
  */
class CoreMRSpec extends SparkSpec {

  private def pairs = Seq(("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5))

  test("mapData: 0..n output pairs per input pair") {
    import spark.implicits._
    val src = spark.createDataset(pairs)
    val out = CoreMR.mapData[String, Int, String, Int](
      src, (k, v) => if (v % 2 == 0) Nil else Seq((k, v), (k.toUpperCase, v)))
      .collect().toSet
    assert(out == Set(
      ("a", 1), ("A", 1), ("a", 3), ("A", 3), ("b", 5), ("B", 5)))
  }

  test("reduceData: reducer sees every value of a key exactly once") {
    import spark.implicits._
    val src = spark.createDataset(pairs)
    val out = CoreMR.reduceData[String, Int, Int](
      src, (_, vs) => Iterator.single(vs.sum))
      .collect().toMap
    assert(out == Map("a" -> 4, "b" -> 7, "c" -> 4))
  }

  test("reduceMapData ≡ reduceData then mapData (fusion preserves semantics)") {
    import spark.implicits._
    val src = spark.createDataset(pairs)
    val fused = CoreMR.reduceMapData[String, Int, Int, String, Int](
      src,
      (_, vs) => Iterator.single(vs.sum),
      (k, sum) => Iterator.single((k + "!", sum * 2)))
      .collect().toSet
    val staged = CoreMR.mapData[String, Int, String, Int](
      CoreMR.reduceData[String, Int, Int](
        spark.createDataset(pairs), (_, vs) => Iterator.single(vs.sum)),
      (k, sum) => Iterator.single((k + "!", sum * 2)))
      .collect().toSet
    assert(fused == staged)
    assert(fused == Set(("a!", 8), ("b!", 14), ("c!", 8)))
  }

  test("HashParter/ModParter: stable, in-range, total (property)") {
    val hp = new CoreMR.HashParter(7)
    val mp = new CoreMR.ModParter(7)
    forAllN(Gen.long) { k: Long =>
      val h1 = hp.getPartition(k)
      assert(h1 == hp.getPartition(k)) // deterministic
      assert(h1 >= 0 && h1 < 7)
      val m = mp.getPartition(k)
      assert(m >= 0 && m < 7)
      assert(m == java.lang.Math.floorMod(k, 7L).toInt) // Mrs mod_partition
    }
  }

  test("wordcount flagship matches hand count on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x y x"), (2L, "y z")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tiny_docs")
    val out = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 2, "y" -> 2, "z" -> 1))
  }
}
