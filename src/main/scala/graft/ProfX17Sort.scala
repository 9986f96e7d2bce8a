package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (r22, VERDICT item 7): does x17's final total ORDER BY's
  * sample-pass re-run of the post-shuffle window+agg chain matter off
  * the sf0.1 floor? Variants at SPARK_GRAFT_SF_DIR (default scratch/sf1):
  *   A declared x17 (window+agg, one keyed exchange, total sort on top —
  *     range-boundary sampling re-runs the post-shuffle chain);
  *   B same body WITHOUT the final sort (chain runs once, no range
  *     exchange) — the lower bound;
  *   C body w/o sort, localCheckpoint(eager), THEN the sort — pays the
  *     sort + materialization but runs the chain once.
  * If A - C >> noise, the sample-pass re-run is worth removing; if
  * A ≈ C (+ checkpoint overhead), it is not.
  */
object ProfX17Sort {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scratch/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tiny = Bench.corpusBytes(sfDir) < (64L << 20)
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      if (tiny) "4"
      else String.valueOf(Bench.sizedShufflePartitions(sfDir, cpus.toInt)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.adaptive.enabled", String.valueOf(!tiny))
      .config("spark.sql.files.maxPartitionBytes",
        String.valueOf(Bench.sizedMaxPartitionBytes(sfDir, cpus.toInt)))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Bench.machineryWarmup(spark)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    def time(tag: String)(f: => Long): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[profx17sort] $tag%-12s median ${walls(walls.size / 2)}%6.3f s of " +
        walls.map(w => f"$w%.3f").mkString("[", " ", "]"))
    }
    val bracket = array(graft.ops.Hdr.ExposureBracket.map(lit): _*)
    def unsorted = {
      val li = graft.ops.Tables.t(spark, sfDir, "lineitem")
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      val five = li
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), (col("l_quantity") / 50.0).as("z0"),
          (col("l_discount") * 10.0).as("z1"))
        .withColumn("slot", row_number().over(w))
        .filter(col("slot") <= 5)
        .select(col("l_orderkey"),
          element_at(bracket, col("slot")).as("t"),
          array(col("z0"), col("z1")).as("px"))
      graft.ops.Hdr.mergeExploded(five, "l_orderkey", "t", "px")
        .select(col("l_orderkey"), col("channel"),
          round(col("radiance"), 6).as("radiance"))
    }
    time("A-declared")(
      Bench.runFull(SparkEntry.queries("x17_hdr_merge")(spark, sfDir)))
    time("B-nosort")(Bench.runFull(unsorted))
    time("C-ckpt+sort") {
      val m = unsorted.localCheckpoint(true)
      val n = Bench.runFull(m.orderBy("l_orderkey", "channel"))
      m.unpersist(true)
      n
    }
    spark.stop()
  }
}
