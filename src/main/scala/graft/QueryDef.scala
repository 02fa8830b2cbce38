package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2: a named query over a
  * scale-factor directory, plus (when SQL-expressible) a DuckDB 1.0.0
  * oracle string the driver hash-compares against.
  *
  * Determinism contract (SURVEY.md §7.4): every query output carries a
  * total-order `ORDER BY`, sums of doubles go through exact DECIMAL
  * arithmetic before a final cast to DOUBLE (order-independent, so the
  * hash compare cannot flake on float summation order), and no
  * engine-specific hash (`hash`/`xxhash64`) ever reaches a declared
  * output — portable hashes are md5-derived on both engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
