package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev instrument (r22, VERDICT item 4): per-query shuffle bytes.
  *
  * The r21 compute-above-sort rewrites traded one evaluation of an
  * expensive chain against a WIDER range exchange (full `text` instead
  * of the computed narrow payload). Locally the CPU term dominates; at
  * scale the exchange payload is the term that grows. This main runs
  * named declared queries and reports, per query: median wall seconds,
  * total shuffle bytes WRITTEN, shuffle bytes READ, and records written
  * — the §2.3 "shuffle fewer bytes" decision evidence.
  *
  * `runMain graft.ProfShuffle q1 q2 ...`; SPARK_GRAFT_REPS (default 3).
  */
object ProfShuffle {
  private class ShuffleMeter extends SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        written.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        recs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
        read.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    def reset(): Unit = { written.set(0); read.set(0); recs.set(0) }
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
    Bench.machineryWarmup(spark)
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"no declared query named $name"))
      val walls = (1 to reps).map { i =>
        graft.ops.Caches.releaseAll(spark)
        if (i == reps) { // meter only the LAST (warm) rep
          Thread.sleep(500) // listener bus is async; let it drain
          meter.reset()
        }
        val t0 = System.nanoTime()
        Bench.runFull(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      Thread.sleep(500)
      val med = walls(walls.size / 2)
      System.err.println(f"[profshuffle] $name%-28s median $med%7.3f s" +
        f"  shuffleWrite ${meter.written.get / 1024.0 / 1024.0}%9.3f MB" +
        f" (${meter.recs.get}%d recs)" +
        f"  shuffleRead ${meter.read.get / 1024.0 / 1024.0}%9.3f MB")
    }
    spark.stop()
  }
}
