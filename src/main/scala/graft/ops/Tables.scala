package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, unix_micros}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  *
  * Every operator in the engine is a `DataFrame => DataFrame` (or a
  * `Column` builder) so it can run both on the 3dptf pose schema and on
  * these TPC-H-ish tables for the DuckDB-oracle checks.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Every downstream consumer (WindowQueries, Windows, Sessionize, the
      // DuckDB oracles' epoch_ns) speaks bigint epoch-nanos, so normalize
      // `ts` here no matter how the parquet file typed it:
      //  - TIMESTAMP(NANOS): Spark has no ns timestamp and refuses the file
      //    (PARQUET_TYPE_ILLEGAL) unless nanosAsLong reads it as raw bigint
      //    epoch-nanos — already the target shape.
      //  - µs TIMESTAMP_NTZ (current driver testdata): wall-clock micros
      //    with no zone; diff against the NTZ epoch literal — pure integer
      //    arithmetic, independent of spark.sql.session.timeZone (an
      //    implicit NTZ→TIMESTAMP cast would NOT be).
      //  - µs TIMESTAMP (instant): unix_micros, zone-independent by
      //    definition.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df
        case TimestampNTZType =>
          df.withColumn("ts",
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
              * lit(1000L))
        case TimestampType =>
          df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
        case other =>
          sys.error(s"events.ts: unsupported parquet type $other")
      }
    } else if (name == "embeddings") {
      // Same drift-guard idea as events.ts: the vector ops (l2sq_f32,
      // dot_f32, the IVF index) require array<float>; if the driver's
      // generator ever re-types the column (float64 parquet would read as
      // array<double>), normalize on load instead of failing analysis.
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => df
        case ArrayType(_, _) =>
          df.withColumn("embedding", col("embedding").cast("array<float>"))
        case other =>
          sys.error(s"embeddings.embedding: unsupported type $other")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
