package graft.functions

import graft.SparkSpec

/** b108: the table-valued function expands to a PLAN the optimizer
  * sees through — Range + built-in expressions, never a UDF — and
  * rejects non-literal arguments loudly at resolution.
  */
class PairsTvfSpec extends SparkSpec {

  test("graft_pairs(n) resolves in SQL and matches the generator " +
      "contract exactly") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT id, value FROM graft_pairs(10) ORDER BY id").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = (0L until 10L).map { i =>
      md.reset()
      (i, md.digest(i.toString.getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == exp)
  }

  test("the expansion is a plan: Range underneath, the filter lands " +
      "on it, no UDF node anywhere") {
    GraftFunctions.register(spark)
    val q = spark.sql(
      "SELECT count(*) AS n FROM graft_pairs(1000) WHERE id >= 990")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Range"), s"no Range in the plan:\n$plan")
    assert(!plan.toLowerCase.contains("udf"),
      s"a TVF must expand to a plan, not a UDF:\n$plan")
    assert(q.head().getLong(0) == 10L)
  }

  test("non-literal and malformed arguments reject loudly at " +
      "resolution") {
    GraftFunctions.register(spark)
    val nonLit = intercept[Exception] {
      spark.sql("SELECT * FROM graft_pairs(1 + rand())").collect()
    }
    assert(nonLit.getMessage.contains("integer literal") ||
      nonLit.getMessage.contains("graft_pairs"))
    val arity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_pairs(1, 2)").collect()
    }
    assert(arity.getMessage.contains("graft_pairs") ||
      arity.getMessage.contains("1 argument"))
  }
}
