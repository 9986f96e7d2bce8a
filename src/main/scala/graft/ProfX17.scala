package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProfX17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // fixed 16 MB splits: this profiler only targets the <=sf10 points
      // whose corpus-sized choice (Bench.sizedMaxPartitionBytes) is
      // exactly 16 MB
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(16L << 20))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.GraftFunctions.register(spark)
    val d = "scratch/sf1"
    def time(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        System.err.println(f"[prof] $tag rep$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val bracket = array(graft.ops.Hdr.ExposureBracket.map(lit): _*)

    // A: current shape (collect_smallest_n)
    time("A-current")(SparkEntry.queries("x17_hdr_merge")(spark, d).count())

    // B: window row_number + WindowGroupLimit
    def winShape = {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      val five = li.select(col("l_orderkey"),
          row_number().over(w).as("slot"),
          (col("l_quantity") / 50.0).as("z0"),
          (col("l_discount") * 10.0).as("z1"))
        .filter(col("slot") <= 5)
        .select(col("l_orderkey"),
          element_at(bracket, col("slot")).as("t"),
          array(col("z0"), col("z1")).as("px"))
      graft.ops.Hdr.mergeExploded(five, "l_orderkey", "t", "px")
        .select(col("l_orderkey"), col("channel"),
          round(col("radiance"), 6).as("radiance"))
        .orderBy("l_orderkey", "channel")
    }
    time("B-window")(winShape.count())
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) winShape.explain("formatted")

    // C: moderate fallback threshold on current shape
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "300000")
    time("C-thresh300k")(SparkEntry.queries("x17_hdr_merge")(spark, d).count())
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    spark.stop()
  }
}
