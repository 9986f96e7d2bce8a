package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingestion semantics (SURVEY.md §2.10): the reference's camera
  * drops files into a directory over hours in bursts of 5;
  * detect_missing_pose (point3d_transformation.py:11-62) is a
  * sessionization over mtimes with a 12 s gap. Structured Streaming forms:
  *
  *  - `sessionGaps`: event-time session windows (works in batch too —
  *    the oracled w8 query reuses it);
  *  - `completeGroups`: count-based groups of 5 per pose id via
  *    flatMapGroupsWithState — emits a group the moment its 5th exposure
  *    arrives, or flushes a partial group when the event-time watermark
  *    passes its timeout (the late-camera-write story the batch reference
  *    doesn't have).
  */
object Sessionize {

  /** One file-arrival event (binaryFile-shaped). */
  case class FileEvent(poseId: String, slot: Int, path: String, ts: Timestamp)

  /** A completed (or timeout-flushed) exposure group. */
  case class PoseGroup(
      poseId: String,
      n: Int,
      complete: Boolean,
      startTs: Timestamp,
      endTs: Timestamp,
      paths: Seq[String])

  /** Per-key accumulator (public: the state encoder's codegen requires a
    * resolvable public constructor).
    */
  case class Acc(paths: Seq[String], slots: Seq[Int],
      startMs: Long, endMs: Long)

  /** Event-time session windows over a timestamp column; `df` may be a
    * batch or streaming DataFrame (streaming requires a watermark
    * upstream). Output: one row per (keyCols, session): n, start, end.
    */
  def sessionGaps(df: DataFrame, tsCol: String, gapSeconds: Long,
      keyCols: Seq[String]): DataFrame = {
    val win = session_window(col(tsCol), s"$gapSeconds seconds")
    df.groupBy(win +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))
      .select(keyCols.map(col) :+ col("n") :+ col("start_ts") :+
        col("end_ts"): _*)
  }

  /** Streaming exact dedup: drop re-delivered file events by
    * (poseId, slot) within the watermark window — the exact-dedup
    * operator of the batch pipeline (Dedup.exactDedup) made streaming.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes it, so state is bounded by event-time skew rather
    * than growing with the stream (the plain dropDuplicates would).
    */
  def dedupedEvents(events: Dataset[FileEvent],
      withinSeconds: Long = 60): Dataset[FileEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"$withinSeconds seconds")
      .dropDuplicatesWithinWatermark("poseId", "slot")
      .as[FileEvent]
  }

  /** Count-based group assembly: emit each pose's group as soon as
    * `groupSize` files arrived; flush incomplete groups when the event
    * time watermark passes last-event + `gapSeconds` (mirrors the 12 s
    * missing-pose rule). State per key is O(groupSize) paths.
    */
  def completeGroups(events: Dataset[FileEvent], groupSize: Int = 5,
      gapSeconds: Long = 12, setWatermark: Boolean = true)
      : Dataset[PoseGroup] = {
    val spark = events.sparkSession
    import spark.implicits._

    def flush(key: String, acc: Acc, complete: Boolean): PoseGroup =
      PoseGroup(key, acc.paths.length, complete,
        new Timestamp(acc.startMs), new Timestamp(acc.endMs),
        acc.paths.reverse)

    // setWatermark=false composes with an upstream stage that already
    // declared one (e.g. dedupedEvents): Spark allows CHAINED stateful
    // operators but forbids REDEFINING the watermark on one lineage —
    // the upstream delay then also governs this stage's timeout sweep
    (if (setWatermark) events.withWatermark("ts", s"$gapSeconds seconds")
     else events)
      .groupByKey(_.poseId)
      .flatMapGroupsWithState[Acc, PoseGroup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[FileEvent], state: GroupState[Acc]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(key, _, complete = false))
            state.remove()
            out.iterator
          } else {
            var acc = state.getOption.getOrElse(
              Acc(Seq.empty, Seq.empty, Long.MaxValue, Long.MinValue))
            val emitted = scala.collection.mutable.ListBuffer[PoseGroup]()
            it.foreach { e =>
              val ms = e.ts.getTime
              acc = Acc(e.path +: acc.paths, e.slot +: acc.slots,
                math.min(acc.startMs, ms), math.max(acc.endMs, ms))
              if (acc.paths.length >= groupSize) {
                emitted += flush(key, acc, complete = true)
                acc = Acc(Seq.empty, Seq.empty, Long.MaxValue, Long.MinValue)
              }
            }
            if (acc.paths.isEmpty) state.remove()
            else {
              state.update(acc)
              state.setTimeoutTimestamp(acc.endMs + gapSeconds * 1000)
            }
            emitted.iterator
          }
      }
  }
}
