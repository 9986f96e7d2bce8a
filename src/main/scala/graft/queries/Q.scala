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

  /** Fan a scan-parallelism-degenerate source out to the session's cores
    * before heavy per-row compute.
    *
    * Parquet scan splits end at row-group boundaries, so a SINGLE file
    * with one row group is ONE task no matter how many cores exist — the
    * shape of the driver's sf0.1 testdata (and of any real corpus
    * delivered as one fat file). A regex/format/trig pipeline then runs
    * serially while 31 cores idle (measured: s4's parse was 7.9 s on one
    * task, DuckDB 1.9 s on 32 threads — Spark's per-row cost is LOWER;
    * only the layout serialized it). One narrow round-robin exchange of
    * the pre-compute columns unlocks the cores.
    *
    * Scale safety: the fan-out only fires when the scan actually planned
    * fewer splits than half the cores — a multi-file corpus (every
    * datagen scale point, any sane 100 TB layout) plans >= cores splits
    * and passes through untouched, so no shuffle is ever added at scale.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val cores = sc.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= cores) df
    else df.repartition(cores)
  }
}
