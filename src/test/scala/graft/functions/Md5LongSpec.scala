package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native md5long must be bit-identical to the composed
  * `conv(substr(md5(x),1,15),16,10)` form it replaced — every DuckDB
  * oracle that hashes (`('0x'||substr(md5(x),1,15))::BIGINT`) depends
  * on this equivalence, at every input including empty strings,
  * multi-byte UTF-8, and nulls.
  */
class Md5LongSpec extends SparkSpec {

  test("md5long == conv(substr(md5,1,15),16,10) on adversarial and random strings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val fixed = Seq("", " ", "a", "hello world", "naïve café 東京",
      "0", "-1", "\t\n", "x" * 1000)
    val rnd = {
      val r = new scala.util.Random(42)
      (1 to 200).map(_ => r.alphanumeric.take(r.nextInt(40)).mkString)
    }
    val rows = spark.createDataset(fixed ++ rnd).toDF("s")
      .select(col("s"),
        call_function("md5long", col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          .as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch on '${r.getString(0)}'")
      assert(r.getLong(1) >= 0L) // 60 bits, never negative
    }
  }

  test("md5long is null-safe and codegen-compatible") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT md5long(CAST(NULL AS STRING))").head()
    assert(r.isNullAt(0))
    // non-string inputs are rejected at analysis (callers cast, as
    // portableHash does)
    intercept[Exception] { spark.sql("SELECT md5long(42)").head() }
    assert(spark.sql("SELECT md5long(CAST(42 AS STRING))").head().getLong(0) ==
      spark.sql("SELECT conv(substr(md5(CAST(42 AS STRING)),1,15),16,10)")
        .head().getString(0).toLong)
  }

  test("portableHash routes through the native expression when a session is active") {
    val plan = graft.util.Tables.documents(spark, sf0001)
      .select(graft.util.Tables.portableHash(col("doc_id")).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("md5long"), plan.take(800))
  }
}
