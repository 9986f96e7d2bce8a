package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Geometry

/** The reference's world-coordinate stage as one declarative Spark plan
  * (point3d_transformation.py:65-171):
  *
  *   euler^3 cross join (a,b,c major order) x serpentine 5x5 grid
  *   -> 3,125 TOOL-in-BASE transforms (odd rotation index walks the grid
  *      backwards), anti-join the 5 missing captures, compacted
  *      positional index, then the 4 sample corners through T.
  *
  * Everything is literals + cross joins + closed-form trig expressions —
  * Catalyst constant-folds the tiny dimension tables and the whole plan
  * is codegen'd; at scale the only data-sized operation is the final
  * per-pose transform.
  *
  * NOTE the euler convention: scipy's R.from_euler('zyx', ...) with a
  * LOWERCASE seq is EXTRINSIC — R = Rx(c) @ Ry(b) @ Rz(a) — not the
  * intrinsic KUKA ZYX (Rz Ry Rx). Verified against the reference's own
  * world_corners output: extrinsic matches to 1e-14, intrinsic is off by
  * centimeters.
  */
object PoseGrid {

  val EulerValues: Seq[Int] = Seq(-20, -10, 0, 10, 20)
  val MissingPoses: Seq[Long] = Seq(51L, 126L, 722L, 1414L, 2203L)
  /** TOOL-frame sample corners, TL,TR,BR,BL (point3d_transformation.py:139). */
  val CornerPts: Seq[(Double, Double, Double)] =
    Seq((90, 90, 0), (-90, 90, 0), (-90, -90, 0), (90, -90, 0))

  /** scipy from_euler('zyx', [a,b,c], degrees=True) twin:
    * R = Rx(c) @ Ry(b) @ Rz(a) (extrinsic z, then y, then x).
    */
  def eulerZyxExtrinsic(aDeg: Column, bDeg: Column, cDeg: Column)
      : Geometry.Mat3 = {
    val (ca, sa) = (cos(radians(aDeg)), sin(radians(aDeg)))
    val (cb, sb) = (cos(radians(bDeg)), sin(radians(bDeg)))
    val (cc, sc) = (cos(radians(cDeg)), sin(radians(cDeg)))
    // Rx(c) Ry(b) Rz(a), rows expanded
    Seq(
      Seq(cb * ca, -cb * sa, sb),
      Seq(sc * sb * ca + cc * sa, -sc * sb * sa + cc * ca, -sc * cb),
      Seq(-cc * sb * ca + sc * sa, cc * sb * sa + sc * ca, cc * cb))
  }

  /** The 25-point serpentine grid in program order: k = row*5 + pos,
    * x = (row-2)*50, y = ((row odd ? 4-pos : pos) - 2)*50
    * (point3d_transformation.py:71-83: odd rows reversed).
    */
  def serpentineGrid(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").as("k"),
      ((expr("id div 5") - 2) * 50.0).as("gx"),
      ((when(expr("id div 5 % 2") === 1, lit(4) - expr("id % 5"))
        .otherwise(expr("id % 5")) - 2) * 50.0).as("gy"))

  /** All 3,125 poses: (pose_idx, a, b, c, gx, gy). Odd rotation indices
    * traverse the serpentine grid in reverse (reverse_grid,
    * point3d_transformation.py:83,98-101).
    */
  def poses(spark: SparkSession): DataFrame = {
    val e = spark.createDataFrame(
      EulerValues.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) })
      .toDF("i", "v")
    val combos = e.select(col("i").as("ia"), col("v").as("a"))
      .crossJoin(e.select(col("i").as("ib"), col("v").as("b")))
      .crossJoin(e.select(col("i").as("ic"), col("v").as("c")))
      .select((col("ia") * 25 + col("ib") * 5 + col("ic")).as("ei"),
        col("a"), col("b"), col("c"))
    val grid = serpentineGrid(spark)
    combos
      .withColumn("k", explode(sequence(lit(0L), lit(24L))))
      .withColumn("k2",
        when(col("ei") % 2 === 0, col("k")).otherwise(lit(24L) - col("k")))
      .join(grid.withColumnRenamed("k", "k2"), "k2")
      .select((col("ei") * 25 + col("k")).as("pose_idx"),
        col("a"), col("b"), col("c"), col("gx"), col("gy"))
  }

  /** World coordinates of the 4 corners for every usable pose, with the
    * COMPACTED index the reference's dict keys address
    * (anti-join missing, then row_number — SURVEY §7.4 J4 subtlety).
    * Output: (idx, corner_idx, wx, wy, wz).
    */
  def worldCorners(spark: SparkSession): DataFrame = {
    val usable = graft.ops.Joins.withCompactedIndex(
      graft.ops.Joins.dropKeys(poses(spark), "pose_idx", MissingPoses),
      "pose_idx")
      .withColumnRenamed("c", "ec") // avoid collision with the corner struct
    val corners = CornerPts.zipWithIndex.map { case ((x, y, z), i) =>
      struct(lit(i).as("ci"), lit(x).as("px"), lit(y).as("py"),
        lit(z).as("pz"))
    }
    val exploded = usable
      .withColumn("corner", explode(array(corners: _*)))
      .select(col("idx"), col("corner.ci").as("corner_idx"),
        col("a"), col("b"), col("ec"), col("gx"), col("gy"),
        col("corner.px").as("px"), col("corner.py").as("py"),
        col("corner.pz").as("pz"))
    val m = eulerZyxExtrinsic(col("a"), col("b"), col("ec"))
    def rowDot(i: Int): Column =
      m(i)(0) * col("px") + m(i)(1) * col("py") + m(i)(2) * col("pz")
    exploded.select(col("idx"), col("corner_idx"),
      (rowDot(0) + col("gx")).as("wx"),
      (rowDot(1) + col("gy")).as("wy"),
      (rowDot(2) + lit(0.0)).as("wz"))
  }

  /** Warp-matrix stage (act_img.py:202 via image_cut_warp.py:19-29):
    * per pose, the homography mapping the detected TL,TR,BR,BL pixel quad
    * onto the (outSize-1)-square — cv2.getPerspectiveTransform semantics,
    * solved by the native SolveHomography expression per group.
    * Input: long-form pixel corners (pose_id, corner_idx, u, v).
    * Output: (pose_id, h array<double>[9]).
    */
  def warpMatrices(pixelCorners: DataFrame, outSize: Int = 800): DataFrame = {
    val s = outSize - 1.0
    val dst = array(
      array(lit(0.0), lit(0.0)), array(lit(s), lit(0.0)),
      array(lit(s), lit(s)), array(lit(0.0), lit(s)))
    graft.expr.GraftFunctions.register(pixelCorners.sparkSession)
    pixelCorners
      .groupBy("pose_id")
      .agg(transform(
        array_sort(collect_list(struct(col("corner_idx"),
          array(col("u").cast("double"), col("v").cast("double")).as("p")))),
        e => e.getField("p")).as("src"))
      .select(col("pose_id"),
        call_function("solve_homography", col("src"), dst).as("h"))
  }
}
