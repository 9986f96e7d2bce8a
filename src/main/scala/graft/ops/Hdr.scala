package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure-Spark HDR-merge semantic for the reference's external `hdrgen`
  * stage (handlehdrgen.py:30-33: 5 bracketed LDR exposures per group ->
  * one HDR radiance image; exposure bracket [1/200,1/800,1/400,1/100,1/50]
  * s, calculate.py:109).
  *
  * The merge is the standard response-recovered weighted average (the
  * algorithm class hdrgen implements, Ward's Photosphere / Debevec-Malik):
  * with a linear response, radiance per pixel is
  *
  *   E_i = sum_s w(z_si) * z_si / t_s  /  sum_s w(z_si)
  *
  * where z is the normalized pixel value, t_s the exposure time, and w a
  * hat weighting that de-emphasizes under/over-exposed pixels. Everything
  * is a Catalyst expression (aggregate/zip_with over the A5 group-collect)
  * — one shuffle, codegen'd per-pixel math, no UDFs — so the stage that
  * needed an external binary in the reference runs as a plain distributed
  * query here.
  */
object Hdr {

  /** The reference's 5-step exposure bracket in slot order
    * (calculate.py:109: [1/200, 1/800, 1/400, 1/100, 1/50] s).
    */
  val ExposureBracket: Seq[Double] =
    Seq(1.0 / 200, 1.0 / 800, 1.0 / 400, 1.0 / 100, 1.0 / 50)

  /** Hat weight 1 - |2z - 1| over normalized z in [0,1], floored so a
    * pixel saturated in every exposure still gets a defined (if
    * unreliable) radiance instead of 0/0.
    */
  def hatWeight(z: Column, floor: Double = 1e-3): Column =
    greatest(lit(floor), lit(1.0) - abs(z * lit(2.0) - lit(1.0)))

  /** Merge each group's bracketed exposures into one radiance array.
    *
    * Input: one row per (group, exposure) with `slotCol` ordering the
    * bracket, `exposureCol` the exposure time in seconds, and `pixelsCol`
    * an array<double> of normalized pixel values (all rows of a group the
    * same length). Groups with fewer than `minExposures` rows are dropped
    * (handlehdrgen.py:25-27's skip guard, P4).
    *
    * Plan shape: groupBy(group).agg(sort_array(collect_list(...))) — the
    * A5 group-collect, one shuffle on the group key — then a single
    * `aggregate` fold over the collected exposures with `zip_with`
    * accumulating per-pixel numerator and denominator in one pass.
    */
  def mergeGroups(df: DataFrame, groupCol: String, slotCol: String,
      exposureCol: String, pixelsCol: String, minExposures: Int = 5)
      : DataFrame = {
    val grouped = df
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(
        col(slotCol).as("slot"),
        col(exposureCol).cast("double").as("t"),
        col(pixelsCol).as("px")))).as("exp"))
      .filter(size(col("exp")) >= minExposures)
    val zeros = transform(element_at(col("exp"), 1).getField("px"),
      _ => lit(0.0))
    grouped
      .withColumn("acc", aggregate(
        col("exp"),
        struct(zeros.as("num"), zeros.as("den")),
        (acc, e) => struct(
          zip_with(acc.getField("num"), e.getField("px"),
            (n, z) => n + hatWeight(z) * z / e.getField("t")).as("num"),
          zip_with(acc.getField("den"), e.getField("px"),
            (d, z) => d + hatWeight(z)).as("den"))))
      .select(col(groupCol),
        zip_with(col("acc").getField("num"), col("acc").getField("den"),
          (n, d) => n / d).as("radiance"))
  }
}
