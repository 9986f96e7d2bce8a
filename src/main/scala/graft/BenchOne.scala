package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: time (and optionally explain) a subset of declared queries —
  * `runMain graft.BenchOne t6_near_dup_candidates t8_jaccard_verify`.
  * Same session shape as Bench; prints per-query seconds to stderr and the
  * formatted plan when SPARK_GRAFT_EXPLAIN=1.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // same size-aware session shape as graft.Bench (see its scaladoc):
    // tiny corpus -> AQE off + 4 shuffle partitions; scale -> AQE + cores
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
      // precondition of graft.ops.Tables (asserted there, set here)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // optional per-stage task-skew probe (see TaskStats scaladoc): the
    // runtime check that blockedPairs' grain bound really holds on a
    // skewed corpus — plan pins can't see task durations
    val taskStats = if (sys.env.get("SPARK_GRAFT_TASK_STATS").contains("1")) {
      val l = new TaskStats
      spark.sparkContext.addSparkListener(l)
      Some(l)
    } else None
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt.max(1)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; have ${SparkEntry.queries.keys.toSeq.sorted}"))
      if (explain) fn(spark, sfDir).explain("formatted")
      // time construction + execution, like graft.Bench: query functions
      // may do eager driver-side work (e.g. collecting tiny centroid
      // tables) that belongs in the reported time
      val walls = (1 to reps).map { rep =>
        // mirror Bench.scala: release graft caches BEFORE timing, so
        // reps 2+ of a caching query (e.g. t11's fp.cache()) measure the
        // full computation, not a cache hit
        graft.ops.Caches.releaseAll(spark)
        // skew probe scoped to the LAST rep (warm JVM — first-rep codegen
        // compilation inflates one arbitrary task's duration and would
        // read as a false straggler); listener events are async, so drain
        // them before reading
        if (rep == reps) taskStats.foreach(_.reset())
        val t0 = System.nanoTime()
        // full materialization, not count() — see Bench.runFull: count()
        // lets Catalyst delete projections/sorts/joins that can't change
        // the row count, silently timing a fraction of the query
        val n = Bench.runFull(fn(spark, sfDir))
        if (rep == reps) taskStats.foreach { l =>
          // the listener bus is async and its waitUntilEmpty is
          // private[spark]; 2 s dwarfs its ms-scale drain latency and
          // this path is opt-in dev tooling, never a timed section
          Thread.sleep(2000)
          l.report(name)
        }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = Bench.median(walls.map(_._1))
      val all = walls.map(w => f"${w._1}%.2f").mkString(" ")
      System.err.println(
        f"[bench-one] $name%-28s median $med%8.2f s of [$all]  (${walls.head._2} rows)")
    }
    spark.stop()
  }
}
