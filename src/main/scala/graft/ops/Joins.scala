package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators (SURVEY.md §2.3), including the reference's one genuinely
  * subtle join: the positional join onto a *compacted* (post-anti-join)
  * sequence (point3d_transformation.py:148-156).
  */
object Joins {

  /** Anti-join a table against a literal key list
    * (point3d_transformation.py:133-135: drop never-photographed poses).
    */
  def dropKeys(df: DataFrame, keyCol: String, missing: Seq[Long]): DataFrame =
    df.filter(!col(keyCol).isin(missing: _*))

  /** Compacted positional index: after filtering, assign 0-based ordinals in
    * `orderCol` order — the reference indexes its filtered pose array by
    * position, so position must be computed AFTER the anti-join
    * (the off-by-reindex subtlety flagged in SURVEY.md §7.4).
    */
  def withCompactedIndex(df: DataFrame, orderCol: String,
      idxName: String = "idx"): DataFrame =
    df.withColumn(idxName,
      row_number().over(Window.orderBy(col(orderCol))) - 1)

  /** Positional join: `lookups` carries integer indices addressing the
    * compacted `base` (ordered by `orderCol`, AFTER dropping `missing`).
    */
  def positionalJoin(base: DataFrame, orderCol: String, missing: Seq[Long],
      lookups: DataFrame, lookupIdx: Column): DataFrame = {
    val compacted = withCompactedIndex(dropKeys(base, orderCol, missing), orderCol)
    lookups.join(compacted, lookupIdx === col("idx"), "inner")
  }
}
