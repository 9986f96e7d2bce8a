package graft

import org.apache.spark.sql.functions._
import graft.pipeline.PoseGrid

/** Golden tests for the world-coordinate and warp stages against the
  * reference's own outputs (data.pkl-derived fixtures).
  */
class PoseGridSpec extends SparkSpec {

  private val fixtures = "src/test/resources/fixtures"

  test("serpentine grid is a permutation of the plain 5x5 grid") {
    val pts = PoseGrid.serpentineGrid(spark)
      .select("gx", "gy").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val plain = (for (i <- -2 to 2; j <- -2 to 2)
      yield (i * 50.0, j * 50.0)).toSet
    assert(pts == plain)
    assert(PoseGrid.serpentineGrid(spark).count() == 25)
  }

  test("pose grid has 3,125 unique pose indices in program order") {
    val p = PoseGrid.poses(spark)
    assert(p.count() == 3125)
    assert(p.select("pose_idx").distinct().count() == 3125)
    // pose 0 = euler(-20,-20,-20), first serpentine point (-100,-100)
    val first = p.filter(col("pose_idx") === 0).collect()(0)
    assert(first.getAs[Double]("a") == -20.0 &&
      first.getAs[Double]("gx") == -100.0 &&
      first.getAs[Double]("gy") == -100.0)
  }

  test("golden: world corners match the reference's world_coords (3,108 poses)") {
    val ours = PoseGrid.worldCorners(spark)
    val want = spark.read.parquet(s"$fixtures/world_corners.parquet")
      .select(expr("CAST(pose_id AS BIGINT)").as("idx"),
        col("corner_idx").cast("long").as("corner_idx"),
        col("x"), col("y"), col("z"))
    val joined = want.join(ours, Seq("idx", "corner_idx"))
    assert(joined.count() == 3108 * 4, "every fixture pose must match a computed pose")
    val maxDiff = joined.agg(max(greatest(
      abs(col("wx") - col("x")), abs(col("wy") - col("y")),
      abs(col("wz") - col("z"))))).collect()(0).getDouble(0)
    assert(maxDiff < 1e-9, s"max world-coord deviation $maxDiff mm")
  }

  test("golden: warp matrices match cv2.getPerspectiveTransform (3,108 poses)") {
    val pix = spark.read.parquet(s"$fixtures/pixel_corners.parquet")
    val ours = PoseGrid.warpMatrices(pix)
    val want = spark.read.parquet(s"$fixtures/warp_matrices.parquet")
      .withColumnRenamed("h", "h_ref")
    val joined = want.join(ours, "pose_id")
    assert(joined.count() == 3108)
    val diffs = joined.select(
      expr("aggregate(zip_with(h, h_ref, (a, b) -> abs(a - b)), 0d, (m, x) -> greatest(m, x))")
        .as("d")).agg(max("d")).collect()(0).getDouble(0)
    assert(diffs < 1e-6, s"max homography entry deviation $diffs")
  }
}
