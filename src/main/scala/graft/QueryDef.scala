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
  *
  * Declared outputs are SCALAR COLUMNS ONLY (no array/map/struct): the
  * driver's pandas-based compare sorts rows by every column and dies
  * on unhashable ndarray cells (b53's array<double> quartiles crashed
  * it in round 6). Explode or split composite values into scalar
  * columns/rows before returning; arrays may flow freely inside a
  * query, just never in its declared output schema.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
