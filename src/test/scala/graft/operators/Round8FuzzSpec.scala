package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Adversarial property fuzz for the round-8 semantics the fixture
  * tests can't stress: exact-boundary session gaps, equal timestamps,
  * composite-key ordering, and kernel determinism under partitioning.
  */
class Round8FuzzSpec extends SparkSpec {

  /** Reference dynamic-gap sessionizer: union of [ts, ts+gap) windows,
    * new session only when ts STRICTLY exceeds the running max end —
    * Spark's merging iterator is inclusive at the boundary (touching
    * windows merge), which this fuzz discovered and now pins.
    */
  private def refSessions(ev: Seq[(Long, Long, String)])
      : Map[(Long, Long), (Long, Long, Long)] =
    ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.map(e => (e._2, e._3)).sorted
      val sessions =
        scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[(Long, String)]]
      var maxEnd = Long.MinValue
      sorted.foreach { case (us, ty) =>
        val gap = if (ty == "error") 300000000L else 1800000000L
        if (us > maxEnd) sessions +=
          scala.collection.mutable.ArrayBuffer((us, ty))
        else sessions.last += ((us, ty))
        maxEnd = math.max(maxEnd, us + gap)
      }
      sessions.map { ss =>
        val ends = ss.map { case (us, ty) =>
          us + (if (ty == "error") 300000000L else 1800000000L)
        }
        ((u, ss.head._1 / 1000000L),
          (ends.max / 1000000L, ss.length.toLong,
            ss.count(_._2 == "error").toLong))
      }
    }.toMap

  test("b70 fuzz: dynamic-gap sessions match the reference on adversarial gaps") {
    import spark.implicits._
    // offsets snap to a 300 s grid so EXACT-boundary arrivals (ts ==
    // running max end, the >= corner) occur constantly, plus duplicate
    // timestamps across types
    val gen = for {
      n <- Gen.choose(1, 24)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        slot <- Gen.choose(0L, 20L)
        ty <- Gen.oneOf("click", "error")
      } yield (u, 1700000000000000L + slot * 300000000L, ty))
    } yield evs
    forAllN(gen, 12) { evs =>
      val df = evs.toDF("user_id", "us", "event_type")
        .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
          col("event_type"))
      val got = TierB.dynamicGapSessions(df).collect()
      val exp = refSessions(evs)
      assert(got.length == exp.size, s"session count for $evs")
      got.foreach { r =>
        val key = (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"))
        val (endS, cnt, nErr) = exp(key)
        assert(r.getAs[Long]("end_s") == endS, s"end for $key in $evs")
        assert(r.getAs[Long]("cnt") == cnt, s"cnt for $key in $evs")
        assert(r.getAs[Long]("n_errors") == nErr, s"errors for $key in $evs")
      }
    }
  }

  test("b64 fuzz: composite ordering == lexicographic (cents, rid) at any scale") {
    val gen = Gen.listOfN(12, for {
      ok <- Gen.oneOf(Gen.choose(0L, 100L), Gen.choose(1L, 1000000000000L))
      ln <- Gen.choose(1L, 7L)
      cents <- Gen.choose(0L, 10500000L)
    } yield (ok, ln, cents))
    forAllN(gen, 200) { rows =>
      val keyed = rows.map { case (ok, ln, cents) =>
        val rid = ok * 8 + ln
        (BigInt(cents) * BigInt(2).pow(50) + rid, (cents, rid))
      }
      // the composite must order exactly like (cents, rid) — including
      // the 100 TB-scale orderkeys the old single-long form corrupted
      val byComposite = keyed.sortBy(_._1).map(_._2)
      val byLex = keyed.map(_._2).sortBy(identity)
      assert(byComposite == byLex, s"ordering diverged for $rows")
    }
  }

  test("minhash kernel fuzz: signatures are partitioning-invariant") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 10)
      docs <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 50L)
        words <- Gen.listOfN(8, Gen.oneOf("a", "b", "c", "dd", "ee"))
      } yield (id, words.mkString(" ")))
    } yield docs.distinctBy(_._1)
    forAllN(gen, 8) { docs =>
      val df = docs.toDF("doc_id", "text")
      val one = TierC.minhashSignatures(spark, df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val many = TierC.minhashSignatures(spark, df.repartition(5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(one == many, s"signatures depend on partitioning for $docs")
    }
  }
}
