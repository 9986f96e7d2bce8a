package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source operators (SURVEY.md §2.1): distributed file scans and the
  * embedded-DSL text parser.
  */
object Sources {

  /** Directory scan as binary files with path/mtime/length
    * (camera_calib.py:46, point3d_transformation.py:19-23). The file listing
    * itself is distributed; `content` is pruned unless selected.
    */
  def binaryScan(spark: SparkSession, dir: String, glob: Option[String] = None)
      : DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Parse KRL-style `LIN {X ..., Y ..., ...}` lines: extract all numbers,
    * take the first 6 as doubles (pose_filter.py:3141-3143).
    * Input df must have a string column `lineCol`; appends x,y,z,a,b,c.
    */
  def parsePoseLine(df: DataFrame, lineCol: String): DataFrame = {
    val nums = call_function("regexp_extract_all",
      col(lineCol), lit("-?\\d+\\.\\d+|-?\\d+"), lit(0))
    val six = transform(slice(nums, 1, 6), s => s.cast("double"))
    df.withColumn("__six", six)
      .withColumn("x", element_at(col("__six"), 1))
      .withColumn("y", element_at(col("__six"), 2))
      .withColumn("z", element_at(col("__six"), 3))
      .withColumn("a", element_at(col("__six"), 4))
      .withColumn("b", element_at(col("__six"), 5))
      .withColumn("c", element_at(col("__six"), 6))
      .drop("__six")
  }
}
