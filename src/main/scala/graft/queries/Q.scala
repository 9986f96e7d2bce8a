package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: Spark implementation + optional DuckDB oracle
  * SQL over the same parquet tables (driver contract, SparkEntry).
  *
  * Determinism rules (SURVEY.md §7.4):
  *  - every query ends with a TOTAL order: a unique key where one exists,
  *    otherwise ORDER BY every output column — (l_orderkey, l_linenumber)
  *    is NOT unique in the synthetic lineitem and supplier names repeat
  *    across scale replicas, so tied rows must be identical rows;
  *  - per-row scalar float chains are written with the exact same expression
  *    text on both sides (bit-identical IEEE evaluation) and rounded to 9;
  *  - aggregate-derived floats are rounded to 6 (partial-agg order differs
  *    from a single-threaded oracle at ~1e-11);
  *  - array outputs are serialized to strings; timestamps to epoch seconds.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.stripMargin.trim))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
