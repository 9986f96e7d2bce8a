package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-stage task-duration skew probe (dev tooling, used by BenchOne
  * under SPARK_GRAFT_TASK_STATS=1): collects successful-task wall
  * durations per stage and reports, for every stage heavy enough to
  * matter, the max/median task-duration ratio.
  *
  * Purpose: the blockedPairs triangle decomposition
  * (ops/Similarity.scala) claims per-task pair work stays bounded by
  * ~maxBlock² REGARDLESS of label skew — a hot label fans out over
  * bucket-pair tasks instead of funnelling |block|² pairs through one
  * task. Plan pins (PlanSpec) prove the shape; this listener proves the
  * RUNTIME claim on a real skewed corpus: if skew leaked into one task,
  * that stage's max/median would spike (a 34%-hot label in one task ≈
  * 12× the pair work of a uniform 10-label task). Judged bar: no
  * straggler task >2× the stage median on the heavy stages.
  *
  * Thresholds: stages with <4 tasks have no meaningful median (a
  * 2-task stage's "max/median" is noise), and stages whose longest task
  * is <500 ms measure scheduling jitter, not work — both excluded from
  * the verdict line but still printed for context.
  */
class TaskStats extends SparkListener {
  import scala.collection.mutable
  private val byStage =
    new mutable.LinkedHashMap[Int, mutable.ArrayBuffer[Long]]

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    // count only successful tasks: a failed/killed attempt's duration is
    // not the work's duration (speculative kills would read as "fast")
    if (t.taskInfo != null && t.taskInfo.successful)
      byStage.getOrElseUpdate(t.stageId, mutable.ArrayBuffer()) +=
        t.taskInfo.duration
  }

  def reset(): Unit = synchronized { byStage.clear() }

  /** One line per stage + a verdict over the heavy stages. Returns the
    * worst heavy-stage max/median (1.0 when no heavy stage exists).
    */
  def report(tag: String): Double = synchronized {
    var worst = 1.0
    byStage.toSeq.sortBy(_._1).foreach { case (sid, ds) =>
      val s = ds.sorted
      val med =
        if (s.size % 2 == 1) s(s.size / 2).toDouble
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      val mx = s.last
      val ratio = if (med > 0) mx / med else 1.0
      val heavy = s.size >= 4 && mx >= 500
      if (heavy) worst = worst.max(ratio)
      System.err.println(f"[task-stats] $tag%-28s stage $sid%4d: " +
        f"${s.size}%4d tasks, median ${med / 1000}%7.2f s, " +
        f"max ${mx / 1000.0}%7.2f s, max/median $ratio%5.2f" +
        (if (heavy) "" else "  (light — excluded from verdict)"))
    }
    System.err.println(
      f"[task-stats] $tag%-28s WORST heavy-stage max/median = $worst%.2f" +
        (if (worst <= 2.0) "  (no straggler >2x median)" else "  STRAGGLER"))
    worst
  }
}
