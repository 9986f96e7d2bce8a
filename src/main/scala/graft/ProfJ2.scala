package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r22, VERDICT item 5 / r20 item 2): attribute j2_semi_join's
  * sf100 drift (15.7 s vs DuckDB 2.6 s same-day, 6.03×) to its phases.
  * Cumulative variants, each timed with the Bench action (toRdd.count —
  * full-column materialization):
  *   P0 scan:     orders.o_custkey scan only
  *   P1 distinct: + the map-side-partial dedup exchange
  *   P2 join:     + customer left-semi join (no sort)
  *   P3 declared: + the total ORDER BY c_custkey (the full query)
  * Per-phase cost = difference of successive medians. Run at any sfDir
  * (`SPARK_GRAFT_SF_DIR`); SPARK_GRAFT_REPS medians (default 3).
  */
object ProfJ2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scratch/sf100")
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
    // per-rep task-metric meter: spill + GC + shuffle bytes tell sort-
    // fallback/memory pressure apart from plain slowness
    object meter extends SparkListener {
      val spillM = new java.util.concurrent.atomic.AtomicLong
      val spillD = new java.util.concurrent.atomic.AtomicLong
      val gc = new java.util.concurrent.atomic.AtomicLong
      val shW = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          spillM.addAndGet(t.taskMetrics.memoryBytesSpilled)
          spillD.addAndGet(t.taskMetrics.diskBytesSpilled)
          gc.addAndGet(t.taskMetrics.jvmGCTime)
          shW.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      def reset(): Unit = { spillM.set(0); spillD.set(0); gc.set(0); shW.set(0) }
    }
    spark.sparkContext.addSparkListener(meter)
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (1 to reps).map { i =>
        Thread.sleep(300); meter.reset()
        val t0 = System.nanoTime()
        Bench.runFull(df)
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        System.err.println(f"[profj2]   $tag rep$i $w%7.3f s" +
          f"  spillMem ${meter.spillM.get >> 20}%d MB  spillDisk ${meter.spillD.get >> 20}%d MB" +
          f"  gc ${meter.gc.get / 1000.0}%.1f s  shW ${meter.shW.get >> 20}%d MB")
        w
      }.sorted
      System.err.println(f"[profj2] $tag%-12s median ${walls(walls.size / 2)}%7.3f s of " +
        walls.map(w => f"$w%.3f").mkString("[", " ", "]"))
    }
    import graft.ops.{Tables => T}
    def keys = T.t(spark, sfDir, "orders").select("o_custkey")
    def dedup = keys.distinct()
    // B-variant: repartition by the key FIRST (one exchange either way),
    // dedup after — skips the map-side partial aggregate whose per-task
    // hash map holds ~4.4M entries for ~6-13% reduction (keys spread
    // uniformly over scan tasks; the GC storm measured in P1)
    def dedupB = keys.repartition(col("o_custkey")).distinct()
    def joined = T.t(spark, sfDir, "customer")
      .join(dedup, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
    def joinedB = T.t(spark, sfDir, "customer")
      .join(dedupB, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
    if (args.contains("full")) {
      // end-to-end A/B of the two full-query shapes, ALTERNATED to
      // cancel JVM-heap-state and box drift (the phase runs above showed
      // strong run-order effects in one long-lived local JVM)
      def fullA = joined.orderBy("c_custkey")
      def fullB = joinedB.orderBy("c_custkey")
      time("FA-1")(fullA); time("FB-1")(fullB)
      time("FB-2")(fullB); time("FA-2")(fullA)
      time("FA-3")(fullA); time("FB-3")(fullB)
    } else {
      time("P0-scan")(keys)
      time("P1-distinct")(dedup)
      time("P1b-repart")(dedupB)
      time("P2-join")(joined)
      time("P2b-join")(joinedB)
      time("P3-declared")(SparkEntry.queries("j2_semi_join")(spark, sfDir))
    }
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      SparkEntry.queries("j2_semi_join")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
