package graft

import graft.util.{GraftProfiler, TmpDir}

/** Unit coverage for the round-2 util additions. */
class UtilSpec extends SparkSpec {

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
