package graft

import graft.util.{GraftProfiler, TmpDir}

/** Unit coverage for the round-2 util additions. */
class UtilSpec extends SparkSpec {

  test("normalizeEventTs: all three corpus encodings land on the same instant") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    // 2024-01-15T12:00:00.123456Z in the three encodings the driver has
    // shipped (or could): long nanos, TIMESTAMP_NTZ µs, TIMESTAMP µs.
    val us = 1705320000123456L
    val rowsNs = java.util.Arrays.asList(org.apache.spark.sql.Row(us * 1000L))
    val rowsTs = java.util.Arrays.asList(
      org.apache.spark.sql.Row(java.time.LocalDateTime
        .ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC)))
    def one(df: org.apache.spark.sql.DataFrame): (String, Long) = {
      val out = graft.util.Tables.normalizeEventTs(df)
      (out.schema("ts").dataType.typeName,
        out.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
          .head.getLong(0))
    }
    val asNs = one(spark.createDataFrame(rowsNs,
      StructType(Seq(StructField("ts", LongType)))))
    val asNtz = one(spark.createDataFrame(rowsTs,
      StructType(Seq(StructField("ts", TimestampNTZType)))))
    assert(asNs == ("timestamp", us))
    assert(asNtz == ("timestamp", us))
    // already-normalized input passes through untouched
    val tsDf = graft.util.Tables.normalizeEventTs(
      spark.sql(s"SELECT timestamp_micros(${us}L) AS ts"))
    assert(one(tsDf) == ("timestamp", us))
    // an unknown encoding must fail loudly, not mis-normalize
    intercept[IllegalStateException] {
      graft.util.Tables.normalizeEventTs(
        spark.sql("SELECT 'oops' AS ts"))
    }
  }

  test("TmpDir paths are under a per-JVM unique base; fresh never repeats") {
    val p1 = TmpDir.path("x")
    val p2 = TmpDir.path("x")
    assert(p1 == p2) // stable within the JVM
    assert(TmpDir.fresh("y") != TmpDir.fresh("y"))
    assert(p1.startsWith(TmpDir.base))
  }

  test("GraftProfiler installs only when graft.profile=true and query still runs") {
    GraftProfiler.install(spark) // knob off: no-op
    spark.conf.set("graft.profile", "true")
    try {
      GraftProfiler.install(spark)
      // listener fires on action; query must complete unperturbed
      assert(spark.range(100).selectExpr("sum(id)").head().getLong(0) == 4950L)
    } finally spark.conf.set("graft.profile", "false")
  }
}
