package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5.2 #3): dedup idempotence,
  * session-window gap laws, set-op algebra — checked on driver-side
  * models and on Spark for the dedup law.
  */
class PipelinePropertiesSpec extends SparkSpec {

  test("exact dedup is idempotent: f(f(x)) == f(x) (property, on Spark)") {
    import spark.implicits._
    forAllN(Gen.listOf(Gen.chooseNum(0, 20)), 20) { xs: List[Int] =>
      val ds = spark.createDataset(xs).toDF("v")
      val once = ds.dropDuplicates().collect().map(_.getInt(0)).sorted.toSeq
      val twice = ds.dropDuplicates().dropDuplicates()
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(once == twice)
      assert(once == xs.distinct.sorted)
    }
  }

  test("session split law: events >= gap apart are never in one session") {
    // model of the d3/d6 sessionizer
    def sessionize(ts: Seq[Long], gap: Long): Seq[Seq[Long]] = {
      val sorted = ts.sorted
      sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.isEmpty || t - acc.last.last > gap) acc :+ Vector(t)
        else acc.init :+ (acc.last :+ t)
      }
    }
    forAllN(Gen.zip(Gen.listOf(Gen.chooseNum(0L, 100000L)),
        Gen.chooseNum(1L, 5000L)), 200) {
      case (ts: List[Long], gap: Long) =>
        val sessions = sessionize(ts, gap)
        // within a session, consecutive gaps are <= gap
        sessions.foreach { s =>
          s.sliding(2).foreach {
            case Seq(a, b) => assert(b - a <= gap)
            case _         =>
          }
        }
        // across session boundaries the gap is > gap
        sessions.sliding(2).foreach {
          case Seq(s1, s2) => assert(s2.head - s1.last > gap)
          case _           =>
        }
        // no event lost or duplicated
        assert(sessions.flatten.sorted == ts.sorted)
    }
  }

  test("set-op algebra: |A ∪ B| + |A ∩ B| == |A| + |B| (distinct sets)") {
    forAllN(Gen.zip(Gen.listOf(Gen.chooseNum(0, 50)),
        Gen.listOf(Gen.chooseNum(0, 50))), 200) {
      case (a: List[Int], b: List[Int]) =>
        val (sa, sb) = (a.toSet, b.toSet)
        assert((sa union sb).size + (sa intersect sb).size == sa.size + sb.size)
        assert((sa diff sb).size == sa.size - (sa intersect sb).size)
    }
  }

  test("minhash band equality is necessary for full-signature equality") {
    // if two docs have identical shingle sets, every band minhash matches
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5"), // exact dup of 1
      (3L, "z1 z2 z3 z4 z5"),
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
        explode(expr("transform(sequence(0, size(split(text,' '))-3), " +
          "i -> concat(split(text,' ')[i],' ',split(text,' ')[i+1],' ',split(text,' ')[i+2]))"))
          .as("sh"))
      .withColumn("h", md5(col("sh")))
      .groupBy("doc_id")
      .agg(min(substring(col("h"), 1, 8)).as("m0"),
        min(substring(col("h"), 9, 8)).as("m1"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
  }
}
