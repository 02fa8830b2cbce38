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
  /** c36's oracled shape: 4032 bits = 64 words. */
  val defaultBits = 4032L

  private def nWords(bits: Long): Int = ((bits + 62) / 63).toInt

  /** Bit index for hash j. `portable` hashes are md5-derived — required
    * whenever false positives reach a DECLARED output (c36), since the
    * oracle must reproduce them. When the result is bloom-invariant
    * (b41's prune: FPs die in the join), `portable = false` uses
    * codegen'd xxhash64 — ~10× cheaper per probe row, which matters
    * when the probe side is the 100 TB fact table.
    */
  def bitOf(prefix: String, c: Column, j: Int, bits: Long = defaultBits,
      portable: Boolean = true): Column =
    if (portable)
      pmod(Tables.portableHash(concat(lit(prefix + ":" + j + ":"),
        c.cast("string"))), lit(bits))
    else pmod(xxhash64(lit(prefix), lit(j), c), lit(bits))

  /** Build the filter from `keys` (must be bounded — the collect is the
    * documented O(k) driver crossing) and return it as a literal array
    * column. Size `bits` to the build side: ~10 bits/key keeps the FP
    * rate under 1%; the array costs bits/8 bytes per TASK BINARY, so
    * even 64512 bits (1024 words) is an 8 KB literal.
    */
  def wordsArray(keys: DataFrame, key: Column, prefix: String,
      hashes: Int, bits: Long = defaultBits, portable: Boolean = true): Column = {
    val words = keys
      .select(explode(array((0 until hashes).map(j =>
        bitOf(prefix, key, j, bits, portable)): _*)).as("b"))
      .select(expr("b div 63").as("w"),
        expr("shiftleft(1L, cast(b % 63 as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    array((0 until nWords(bits)).map(w =>
      lit(words.getOrElse(w.toLong, 0L))): _*)
  }

  /** Add a boolean `out` column — the might-contain verdict for `key`
    * against `wordArr`. The probe-bit scratch columns live only inside
    * this call. (`expr` with named columns because the Column API lacks
    * an integer div and `shiftleft` takes only a literal shift.)
    */
  def withMight(df: DataFrame, key: Column, wordArr: Column, prefix: String,
      hashes: Int, out: String, bits: Long = defaultBits,
      portable: Boolean = true): DataFrame = {
    // scratch columns are prefix-namespaced so a caller column can't be
    // silently clobbered and dropped; collisions fail fast instead
    val wc = s"${prefix}_bfw"
    def bc(j: Int) = s"${prefix}_bfb$j"
    val clash = df.columns.toSet
      .intersect((wc +: (0 until hashes).map(bc)).toSet)
    require(clash.isEmpty, s"BloomLit scratch columns collide: $clash")
    val base = df.withColumn(wc, wordArr)
    val withBits = (0 until hashes).foldLeft(base) { case (acc, j) =>
      acc.withColumn(bc(j), bitOf(prefix, key, j, bits, portable))
    }
    val might = expr((0 until hashes).map(j =>
      s"(element_at($wc, cast(${bc(j)} div 63 as int) + 1) & " +
        s"shiftleft(1L, cast(${bc(j)} % 63 as int))) != 0").mkString(" AND "))
    withBits.withColumn(out, might)
      .drop((wc +: (0 until hashes).map(bc)): _*)
  }
}
