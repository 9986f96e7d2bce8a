package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sinks

/** The reference's orchestrated calibration DAG (data_pipeline.py:10-56)
  * as memoized Runner stages — each guard (`if pixel_coords is None`)
  * becomes a materialized-table existence check:
  *
  *   warp_matrices   <- per-pose homography (act_img.py:254-324)
  *   world_corners   <- pose grid + rigid transform (point3d_transformation)
  *   matched_corners <- positional join of detections onto the compacted
  *                      pose sequence (J4)
  *   extrinsic       <- PnP init + LM refine + reprojection stats,
  *                      persisted as a matrix sink (S6)
  */
object DataPipeline {

  /** Full DAG including the reference's FIRST stage (data_pipeline.py:19-24
    * `if data.camera_matrix is None: cam_calib(...)`): intrinsics are
    * COMPUTED from the chessboard corner table via the Zhang composite
    * (Intrinsic.calibrate), memoized as the `camera_matrix` stage, then fed
    * to the downstream extrinsic DAG — k/dist are outputs, not inputs.
    * `calibCorners`: long-form (view_id, corner_idx, u, v, x, y) at detect
    * scale (camera_calib.py:61-63's 0.5x resize).
    */
  def run(spark: SparkSession, pixelCorners: DataFrame,
      calibCorners: DataFrame, stateDir: String, maxIter: Int)
      : Map[String, DataFrame] = {
    val runner = new Runner(spark, stateDir)
    if (!runner.isMaterialized("camera_matrix")) {
      val res = Intrinsic.calibrate(calibCorners)
      Sinks.matrixSink(spark, stateDir, "camera_matrix", Map(
        "k" -> res.k, "dist" -> res.dist,
        "mean_error" -> Seq(res.meanReprojError)))
    }
    val cam = Sinks.loadTable(spark, stateDir, "camera_matrix")
    val row = cam.collect()(0)
    def arr(n: String) = row.getAs[scala.collection.Seq[Double]](n).toSeq
    run(spark, pixelCorners, stateDir, arr("k"), arr("dist"), maxIter) +
      ("camera_matrix" -> cam)
  }

  /** Run (or resume) the DAG. `pixelCorners` is the long-form detected
    * corner table (pose_id, corner_idx, u, v); k/dist are the intrinsics.
    * Returns the materialized stage tables by name.
    */
  def run(spark: SparkSession, pixelCorners: DataFrame, stateDir: String,
      k: Seq[Double], dist: Seq[Double], maxIter: Int = 50)
      : Map[String, DataFrame] = {
    val runner = new Runner(spark, stateDir)

    val warp = runner.stage("warp_matrices") {
      PoseGrid.warpMatrices(pixelCorners)
    }

    val world = runner.stage("world_corners") {
      PoseGrid.worldCorners(spark)
    }

    val matched = runner.stage("matched_corners") {
      // J4: dict key addresses the compacted pose sequence
      pixelCorners
        .withColumn("idx", expr("try_cast(pose_id AS BIGINT)"))
        .filter(col("idx").isNotNull)
        .join(world, Seq("idx", "corner_idx"))
        .select(col("pose_id"), col("ord"), col("corner_idx"),
          col("u"), col("v"),
          col("wx").as("x"), col("wy").as("y"), col("wz").as("z"))
    }

    if (!runner.isMaterialized("extrinsic")) {
      // cached for the optimizer's repeated passes (each LM iteration
      // aggregates over it), released once the stats are materialized
      matched.cache()
      try {
        val init = Extrinsic.initPnp(matched, k)
        val (p, _) = Extrinsic.refine(matched, k, dist, init, maxIter)
        val t = Extrinsic.paramsToT(p)
        val stats = Extrinsic.reprojectionStats(matched, k, dist, t)
        Sinks.matrixSink(spark, stateDir, "extrinsic", Map(
          "extrinsic" -> t,
          "rvec" -> p.take(3), "tvec" -> p.drop(3),
          "stats" -> Seq(stats("mean_error"), stats("std_error"),
            stats("max_error"), stats("min_error"), stats("median_error"),
            stats("rmse"))))
      } finally matched.unpersist(false)
    }
    val extrinsic = Sinks.loadTable(spark, stateDir, "extrinsic")

    Map("warp_matrices" -> warp, "world_corners" -> world,
      "matched_corners" -> matched, "extrinsic" -> extrinsic)
  }
}
