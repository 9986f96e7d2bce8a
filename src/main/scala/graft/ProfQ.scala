package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiling main (optimization-round tooling, like ProfX17): for each
  * named query, split wall time into CONSTRUCT (the QueryDef fn call,
  * which may run eager driver work), PLAN (force executedPlan), and
  * EXECUTE (Bench.runFull), and count jobs/stages/tasks via a listener.
  *
  * Purpose: at the sf0.1 gate 66 of 95 declared lines are floor-dominated
  * (BENCH_full_r20: 12.0 s Spark vs 1.7 s DuckDB) — this tool attributes
  * that fixed cost (Catalyst analysis? job count? task scheduling?) so
  * optimization targets the real component instead of guessing.
  * `runMain graft.ProfQ q1 q2 ...` (no args = all), SPARK_GRAFT_REPS
  * reps per query (default 2; the LAST rep is reported — warm numbers,
  * codegen cache hit — with the first rep's cold total for contrast).
  */
object ProfQ {
  private class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      tasks.incrementAndGet()
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0) }
  }

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
    spark.range(1000).selectExpr("sum(id)").collect()
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    System.err.println(
      "[profq] name, cold_total_s | warm: construct_s plan_s exec_s " +
        "(jobs/stages/tasks across the whole warm rep)")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      var cold = 0.0
      var line = ""
      (1 to reps).foreach { rep =>
        graft.ops.Caches.releaseAll(spark)
        counter.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        Bench.runFull(df)
        val t3 = System.nanoTime()
        if (rep == 1) cold = (t3 - t0) / 1e9
        if (rep == reps) {
          // listener bus is async; tiny drain wait keeps counts honest
          Thread.sleep(300)
          line = f"[profq] $name%-28s cold ${cold}%6.2f | " +
            f"construct ${(t1 - t0) / 1e9}%6.3f  plan ${(t2 - t1) / 1e9}%6.3f  " +
            f"exec ${(t3 - t2) / 1e9}%6.3f  " +
            f"(${counter.jobs.get}%2d jobs ${counter.stages.get}%3d stages " +
            f"${counter.tasks.get}%4d tasks)"
        }
      }
      System.err.println(line)
    }
    spark.stop()
  }
}
