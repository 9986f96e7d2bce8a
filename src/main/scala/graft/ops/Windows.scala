package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window / sort / sessionization operators (SURVEY.md §2.5). */
object Windows {

  /** Gap detection between consecutive fixed-size groups — the reference's
    * missing-pose check (point3d_transformation.py:11-62): order events,
    * bucket into groups of `groupSize`, compare each group's end time with
    * the next group's start time, flag gaps over `gapSeconds`.
    *
    * Input df needs `orderCol` (unique total order) and `tsCol` (timestamp).
    * Output: (group_id, start_s, end_s, next_start_s, gap_s) for gaps only.
    *
    * Scale note: row_number over a global order is a single-partition sort
    * at the window stage — at 100 TB the same computation is expressed per
    * session key or via the streaming form (graft.streaming.Sessionize);
    * for the reference's semantics (one camera, one global order) this is
    * the faithful shape and the group-agg after it is fully parallel.
    */
  def gapSessions(df: DataFrame, orderCol: String, tsCol: String,
      groupSize: Int = 5, gapSeconds: Long = 12): DataFrame = {
    val rn = row_number().over(Window.orderBy(col(orderCol)))
    val grouped = df
      .withColumn("rn", rn)
      .withColumn("grp", expr(s"(rn - 1) div $groupSize"))
      .groupBy("grp")
      .agg(
        min(unix_timestamp(col(tsCol))).as("start_s"),
        max(unix_timestamp(col(tsCol))).as("end_s"))
    grouped
      .withColumn("next_start_s", lead(col("start_s"), 1)
        .over(Window.orderBy(col("grp"))))
      .withColumn("gap_s", col("next_start_s") - col("end_s"))
      .filter(col("gap_s") > gapSeconds)
      .select(col("grp").as("group_id"), col("start_s"), col("end_s"),
        col("next_start_s"), col("gap_s"))
      .orderBy("group_id")
  }
}
