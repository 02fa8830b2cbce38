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

  test("iterate: producer runs once per round, consumer=false stops the loop") {
    val trace = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val out = CoreMR.iterate(0, maxRounds = 100) { (s, t) =>
      trace += (("produce", t)); s + t
    } { (s, t) =>
      trace += (("consume", t)); s < 6 // stops after 1+2+3
    }
    assert(out == 6)
    assert(trace.toSeq == Seq(("produce", 1), ("consume", 1),
      ("produce", 2), ("consume", 2), ("produce", 3), ("consume", 3)))
  }

  test("iterate: maxRounds bounds a never-converging loop") {
    var n = 0
    CoreMR.iterate((), maxRounds = 5)((_, _) => n += 1)((_, _) => true)
    assert(n == 5)
  }

  test("generate: every batch is scheduled before the first result is consumed") {
    import java.util.concurrent.atomic.AtomicInteger
    import scala.concurrent.{Future, Promise}
    import scala.concurrent.ExecutionContext.Implicits.global
    val scheduled = new AtomicInteger(0)
    val gate = Promise[Unit]()
    val seenAtFirstCallback = new AtomicInteger(-1)
    def gen(b: Int): Future[Int] = {
      scheduled.incrementAndGet()
      // batch 0 resolves only after ALL generators ran — if generate
      // consumed lazily batch-by-batch this would deadlock, so passing
      // proves the overlap (all jobs in flight before consumption).
      if (scheduled.get() == 4) gate.trySuccess(())
      gate.future.map(_ => b * 10)
    }
    val sum = CoreMR.generate(0, 4)(gen) { (s, r, b) =>
      if (b == 0) seenAtFirstCallback.set(scheduled.get())
      (s + r, true)
    }
    assert(sum == 0 + 10 + 20 + 30)
    assert(seenAtFirstCallback.get() == 4)
  }

  test("generate: callback continue=false stops consuming remaining batches") {
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val consumed = scala.collection.mutable.ArrayBuffer.empty[Int]
    CoreMR.generate((), 6)(b => Future.successful(b)) { (_, r, _) =>
      consumed += r
      ((), r < 2)
    }
    assert(consumed.toSeq == Seq(0, 1, 2))
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
