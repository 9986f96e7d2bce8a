package graft

import org.apache.spark.sql.SparkSession

/** Dev attribution main (r22, VERDICT item 2): where do
  * `sim3_index_build`'s ~3.2-4.0 s go? The line runs FIRST in every
  * Bench session (right after a trivial range-sum warmup), so its
  * reported time may be dominated by one-time JVM/Spark machinery
  * warmup (parquet reader init, janino codegen of the first real plan
  * shapes, persist machinery) rather than the Lloyd passes the line
  * nominally measures.
  *
  * `runMain graft.ProfIdx [warm]` — same session shape as Bench. With
  * no arg it reproduces Bench exactly: trivial warmup, then a COLD
  * timed build, then SPARK_GRAFT_REPS cache-cleared warm rebuilds.
  * With arg `warm` it first runs a GENERIC machinery warmup (tiny
  * parquet roundtrip under java.io.tmpdir + groupBy + persist on
  * range data — touches no testdata, computes no declared query) and
  * then the same cold build: if the "cold" build collapses toward the
  * warm rebuild number, the difference is machinery warmup, not Lloyd.
  */
object ProfIdx {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profidx] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // Bench's existing trivial warmup
    t("trivial_warmup") { spark.range(1000).selectExpr("sum(id)").collect() }
    if (args.contains("warm")) t("machinery_warmup") {
      Bench.machineryWarmup(spark)
    }
    t("index_build_cold") { graft.queries.SimQueries.sim3Index(spark, sfDir) }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    (1 to reps).foreach { i =>
      graft.ops.Similarity.clearIndexCache()
      t(s"index_build_warm_$i") {
        graft.queries.SimQueries.sim3Index(spark, sfDir)
      }
    }
    spark.stop()
  }
}
