package graft

import org.apache.spark.sql.functions.col

/** Driver-contract smoke (SURVEY §5.2 #1/#4): every declared query runs
  * at sf0.001 and returns rows with a stable schema; oracle keys are a
  * subset of query names; entry() is non-empty.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("oracleSql keys ⊆ queries keys (driver contract)") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("entry returns rows > 0 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001, rows > 0, distinct column names, sane plan") {
      val df = fn(spark, sf0001)
      val cols = df.columns.toSeq
      assert(cols.distinct == cols, s"duplicate output columns: $cols")
      assert(df.count() > 0, s"$name returned no rows")
      // blanket scale audit: NO declared query may plan an all-pairs
      // join — the two shapes that silently explode at 100 TB
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested loop:\n$p")
    }
  }

  test("a16_wordcount top word matches independent RDD count") {
    val df = SparkEntry.queries("a16_wordcount")(spark, sf0001)
    val top = df.limit(1).collect()(0)
    val rdd = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).rdd
      .flatMap(_.getString(0).split(" "))
      .map(_ -> 1L).reduceByKey(_ + _)
      .collect().toMap
    assert(rdd(top.getString(0)) == top.getLong(1))
    assert(top.getLong(1) == rdd.values.max)
  }
}
