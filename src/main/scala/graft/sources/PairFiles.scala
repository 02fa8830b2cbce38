package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's file-format module as a library API
  * [mrs: mrs/fileformats.py]: writers/readers selected by format, all
  * round-tripping (key, value) pair datasets. Spark-native equivalents:
  *
  *  - text:    `key<TAB>value` lines (Mrs TextWriter/TextReader)
  *  - hex:     `key<TAB>hex(value)` lines, lossless for arbitrary bytes
  *             (Mrs HexWriter/HexReader)
  *  - parquet: typed columnar round-trip (capability match for Mrs
  *             BinWriter/BinReader — lossless, schema'd, splittable)
  *
  * All writers emit one file per partition (parallel at any scale);
  * readers parallelize by file/row-group. Callers pass DataFrames with
  * `key`/`value` string (text/hex) or arbitrary schema (parquet).
  */
object PairFiles {

  /** Mrs TextWriter: one `key<TAB>value` line per pair. Null fields
    * write as empty (concat_ws would DROP the tab for a null, shifting
    * the value into the key on read-back — or crashing element_at
    * under ANSI mode).
    */
  def writeText(pairs: DataFrame, path: String): Unit =
    pairs
      .select(concat(coalesce(col("key"), lit("")), lit("\t"),
        coalesce(col("value"), lit(""))).as("value"))
      .write.mode("overwrite").text(path)

  /** Mrs TextReader: lines back to (key, value) string pairs. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(
        element_at(col("kv"), 1).as("key"),
        element_at(col("kv"), 2).as("value"))

  /** Mrs HexWriter: `key<TAB>hex(value)` — lossless for values
    * containing tabs/newlines/arbitrary bytes.
    */
  def writeHex(pairs: DataFrame, path: String): Unit =
    pairs
      .select(concat(coalesce(col("key"), lit("")), lit("\t"),
        coalesce(hex(col("value").cast("binary")), lit(""))).as("value"))
      .write.mode("overwrite").text(path)

  /** Mrs HexReader. */
  def readHex(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(
        element_at(col("kv"), 1).as("key"),
        unhex(element_at(col("kv"), 2)).cast("string").as("value"))

  /** Mrs BinWriter capability match: lossless typed round-trip. */
  def writeBin(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readBin(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
