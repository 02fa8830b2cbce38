package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Literal-array Bloom filter: a deterministic md5 bloom (4032 bits
  * folded into 64 63-bit words) built from a BOUNDED key set, collected
  * to the driver (64 longs — SCALE.md §4's O(k) discipline) and inlined
  * as a literal array column. Probing is then pure codegen'd map-side
  * work — no join, no shuffle, no broadcast variable. This is the
  * engine-level shape of a runtime filter: build on the selective side,
  * prune the big side before its exchange. Shared by c36 (Bloom
  * decontamination) and b41 (bloom-pruned join).
  *
  * Every bit is md5-derived ([[Tables.portableHash]]), so when a
  * declared output depends on the filter's false positives (c36) a
  * DuckDB oracle reproduces them bit-for-bit.
  */
object BloomLit {
  val bits = 4032L
  val nWords = 64

  def bitOf(prefix: String, c: Column, j: Int): Column =
    pmod(Tables.portableHash(concat(lit(prefix + ":" + j + ":"),
      c.cast("string"))), lit(bits))

  /** Build the 64-word filter from `keys` (must be bounded — the
    * collect is the documented O(k) driver crossing) and return it as a
    * literal array column.
    */
  def wordsArray(keys: DataFrame, key: Column, prefix: String,
      hashes: Int): Column = {
    val words = keys
      .select(explode(array((0 until hashes).map(j =>
        bitOf(prefix, key, j)): _*)).as("b"))
      .select(expr("b div 63").as("w"),
        expr("shiftleft(1L, cast(b % 63 as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    array((0 until nWords).map(w => lit(words.getOrElse(w.toLong, 0L))): _*)
  }

  /** Add a boolean `out` column — the might-contain verdict for `key`
    * against `wordArr`. The probe-bit scratch columns live only inside
    * this call. (`expr` with named columns because the Column API lacks
    * an integer div and `shiftleft` takes only a literal shift.)
    */
  def withMight(df: DataFrame, key: Column, wordArr: Column, prefix: String,
      hashes: Int, out: String): DataFrame = {
    val base = df.withColumn("bf_words", wordArr)
    val withBits = (0 until hashes).foldLeft(base) { case (acc, j) =>
      acc.withColumn(s"bf_b$j", bitOf(prefix, key, j))
    }
    val might = expr((0 until hashes).map(j =>
      s"(element_at(bf_words, cast(bf_b$j div 63 as int) + 1) & " +
        s"shiftleft(1L, cast(bf_b$j % 63 as int))) != 0").mkString(" AND "))
    withBits.withColumn(out, might)
      .drop(("bf_words" +: (0 until hashes).map(j => s"bf_b$j")): _*)
  }
}
