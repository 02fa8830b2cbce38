package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 sink: short-name resolution, per-partition files, commit
  * atomicity (no temp leftovers), truncate-on-overwrite, nulls.
  */
class PairSinkSourceSpec extends SparkSpec {

  private def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.format("pairsink").mode("overwrite").option("path", path).save()

  test("round trip: key<TAB>value lines, one part file per partition") {
    import spark.implicits._
    val path = graft.util.TmpDir.fresh("pairsink-rt")
    val df = (1 to 100).map(i => (s"k$i", s"v$i")).toDF("key", "value")
      .repartition(4)
    write(df, path)
    val files = new java.io.File(path).listFiles()
    assert(files.count(_.getName.endsWith(".pairs")) == 4, files.toSeq)
    assert(!files.exists(_.getName.startsWith(".tmp")), "temp file leaked")
    val back = PairFiles.readText(spark, s"$path/*.pairs")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == (1 to 100).map(i => s"k$i" -> s"v$i").toMap)
  }

  test("mode overwrite truncates prior output (no stale part files)") {
    import spark.implicits._
    val path = graft.util.TmpDir.fresh("pairsink-ow")
    write((1 to 50).map(i => (s"a$i", "x")).toDF("key", "value")
      .repartition(8), path)
    write(Seq(("only", "row")).toDF("key", "value").repartition(1), path)
    val back = PairFiles.readText(spark, s"$path/*.pairs").collect()
    assert(back.length == 1 && back.head.getString(0) == "only")
  }

  test("null fields write as empty strings, non-string types via toString") {
    import spark.implicits._
    val path = graft.util.TmpDir.fresh("pairsink-null")
    write(Seq((7L, Option.empty[String]), (8L, Some("ok")))
      .toDF("key", "value").repartition(1), path)
    val lines = spark.read.text(s"$path/*.pairs")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(lines == Seq("7\t", "8\tok"))
  }
}
