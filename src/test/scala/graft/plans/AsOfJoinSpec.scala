package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The custom-operator stack: physical plan shape, cross-check against
  * the composition twin, and edge semantics on tiny data.
  */
class AsOfJoinSpec extends SparkSpec {

  test("b32 plans AsOfJoinExec with exchanges+sorts inserted by EnsureRequirements") {
    val df = SparkEntry.queries("b32_join_asof_native")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("AsOfJoin "), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Sort ["), p)
  }

  test("custom exec result == composition twin result (b32 == b31)") {
    val native = SparkEntry.queries("b32_join_asof_native")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val composed = SparkEntry.queries("b31_join_asof")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(native == composed)
  }

  test("left-only filter is pushed below AsOfJoin and reaches the parquet scan") {
    val d = sf0001
    graft.util.Tables.events(spark, d) // ensure nanosAsLong conf set
    val e = graft.util.Tables.events(spark, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cus"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), unix_micros(col("ts")).as("pus"),
        col("event_id"))
    val joined = AsOfJoin.join(purch, clicks, "pu", "pus", "cu", "cus")
      .filter(col("event_id") % 2 === 0) // left-only predicate ABOVE the join
    // logical: the filter must sit BELOW the AsOfJoinPlan after optimize
    val opt = joined.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    assert(joinNode.left.toString.contains("event_id"),
      s"filter not pushed into left child:\n$opt")
    // physical: it reaches the left scan's data filters
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.startsWith("Filter"), phys)
    // result equality with the unpushed evaluation order
    val unpushed = AsOfJoin.join(
      purch.filter(col("event_id") % 2 === 0), clicks, "pu", "pus", "cu", "cus")
    assert(joined.count() == unpushed.count())
  }

  test("fuzz: AsOfJoinExec == reference semantics on random inputs") {
    import spark.implicits._
    import org.scalacheck.Gen
    val genCase = for {
      nl <- Gen.choose(0, 40)
      left <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 30L)
      } yield (k, t))
      // right (k,t) pairs kept DISTINCT: among equal (k,t) rows the
      // operator's pick is unspecified, like any sort-merge tie
      rightKT <- Gen.listOf(for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 30L)
      } yield (k, t)).map(_.distinct)
    } yield (left, rightKT)
    forAllN(genCase, 15) { case (leftRows, rightKT) =>
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rightKT.map { case (k, t) => (k, t, k * 1000 + t) }
      val out = AsOfJoin.join(
        left.toDF("k", "t", "lid"), right.toDF("k2", "t2", "rid"),
        "k", "t", "k2", "t2")
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(identity).toSeq
      val expect = left.map { case (k, t, lid) =>
        val cand = right.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cand.isEmpty) -1L else cand.maxBy(_._2)._3)
      }.sortBy(identity)
      assert(out == expect, s"left=$left right=$right")
    }
  }

  test("generalized types: string key + TimestampType time, direct join") {
    import spark.implicits._
    val left = Seq(("u1", 100L, 10L), ("u1", 200L, 11L), ("u2", 50L, 20L))
      .toDF("k", "us", "lid").withColumn("t", timestamp_micros(col("us")))
    val right = Seq(("u1", 100L, 90L), ("u1", 150L, 91L), ("u1", 300L, 92L))
      .toDF("k2", "us2", "rid").withColumn("t2", timestamp_micros(col("us2")))
    val out = AsOfJoin.join(left, right, "k", "t", "k2", "t2")
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(10L -> 90L, 11L -> 91L, 20L -> -1L))
  }

  test("fuzz: interpreted path (string key, decimal time) == primitive long path") {
    import spark.implicits._
    import org.scalacheck.Gen
    val genCase = for {
      nl <- Gen.choose(0, 25)
      left <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 30L)
      } yield (k, t))
      rightKT <- Gen.listOf(for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 30L)
      } yield (k, t)).map(_.distinct)
    } yield (left, rightKT)
    forAllN(genCase, 8) { case (leftRows, rightKT) =>
      val left = leftRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rightKT.map { case (k, t) => (k, t, k * 1000 + t) }
      def run(l: org.apache.spark.sql.DataFrame,
              r: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        AsOfJoin.join(l, r, "k", "t", "k2", "t2")
          .select("lid", "rid").collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
          .sortBy(identity).toSeq
      // single-digit keys: string sort order == numeric sort order, so
      // both paths see identically-sorted partitions
      def widen(df: org.apache.spark.sql.DataFrame, k: String, t: String) = df
        .withColumn(k, concat(lit("key-"), col(k)))
        .withColumn(t, col(t).cast("decimal(10,2)"))
      val longOut = run(left.toDF("k", "t", "lid"), right.toDF("k2", "t2", "rid"))
      val genOut = run(widen(left.toDF("k", "t", "lid"), "k", "t"),
        widen(right.toDF("k2", "t2", "rid"), "k2", "t2"))
      assert(genOut == longOut, s"left=$left right=$right")
    }
  }

  test("null keys/times never match and never reach the comparators") {
    import spark.implicits._
    val left = Seq((Some("u1"), Some(100L), 10L), (None, Some(50L), 20L),
      (Some("u1"), None, 30L)).toDF("k", "t", "lid")
    val right = Seq((Some("u1"), Some(90L), 90L), (None, Some(80L), 91L))
      .toDF("k2", "t2", "rid")
    val out = AsOfJoin.join(left, right, "k", "t", "k2", "t2")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // only the fully-non-null left row survives; the null-keyed right
    // row is never a candidate
    assert(out == Map(10L -> 90L))
  }

  test("as-of semantics on tiny data: latest at-or-before, null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 20L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 90L), (1L, 150L, 91L), (1L, 300L, 92L))
      .toDF("k2", "t2", "rid")
    val out = AsOfJoin.join(left, right, "k", "t", "k2", "t2")
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // lid 10 (t=100): rid 90 at t2=100 (equal counts, at-or-before)
    // lid 11 (t=200): rid 91 at t2=150 (latest <= 200; 300 excluded)
    // lid 20 (k=2): no right rows for key -> null
    assert(out == Map(10L -> 90L, 11L -> 91L, 20L -> -1L))
  }
}
