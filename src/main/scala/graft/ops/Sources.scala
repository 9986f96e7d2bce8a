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
  def binaryScan(spark: SparkSession, dir: String, glob: Option[String] = None,
      recursive: Boolean = false): DataFrame = {
    val r = spark.read.format("binaryFile")
      .option("recursiveFileLookup", String.valueOf(recursive))
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Directory scan yielding (path, length, prefix): the first `maxBytes`
    * of each file, read with a bounded positional read. The binaryFile
    * source would materialize the WHOLE file as one byte array — capped at
    * the JVM's 2 GB array limit and O(file size) memory — so any corpus
    * with a single >2 GB object (sf30's 4.1 GB lineitem.parquet; routine
    * at 100 TB) kills the scan even when the query only fingerprints a
    * prefix. Here the distributed listing (content pruned) drives a
    * per-file bounded read, so cost is O(maxBytes) per file regardless of
    * file size. Reference behavior: act_img.py's header/EXIF sniffing
    * reads only the file head, never the full image.
    */
  def binaryPrefixScan(spark: SparkSession, dir: String,
      glob: Option[String] = None, maxBytes: Int = 1048576): DataFrame = {
    import spark.implicits._
    val listed = binaryScan(spark, dir, glob)
      .select("path", "length").as[(String, Long)]
    // Broadcast the SESSION's Hadoop conf (spark.hadoop.* — object-store
    // credentials, endpoints, custom FS settings) to the tasks: a fresh
    // `new Configuration()` resolves only default resources, which happens
    // to work on file:// but silently ignores the session's settings on
    // any s3a/abfs/HDFS deployment while every other scan honors them.
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    listed.mapPartitions { it =>
      val conf = confBc.value.value
      it.map { case (path, len) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val n = math.min(len, maxBytes.toLong).toInt
        val buf = new Array[Byte](n)
        if (n > 0) {
          val in = fs.open(p)
          try in.readFully(0L, buf) finally in.close()
        }
        (path, len, buf)
      }
    }.toDF("path", "length", "prefix")
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
