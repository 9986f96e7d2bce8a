package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry expression library — pure Catalyst expression trees (no UDFs),
  * so every op is codegen-friendly, pushdown-transparent, and DuckDB-oracle
  * comparable.
  *
  * Re-expresses the reference's per-record numpy/cv2 math
  * (reference: point3d_transformation.py:87-120 euler/transform,
  * extrinsic_calibration.py:114-124 pinhole projection,
  * image_cut_warp.py:33-36 homography apply, lumiadjust.py:14 scale).
  */
object Geometry {

  /** 3x3 row-major matrix of Columns. */
  type Mat3 = Seq[Seq[Column]]

  /** Euclidean norm of a 2D residual (extrinsic_calibration.py:212). */
  def norm2(du: Column, dv: Column): Column =
    sqrt(du * du + dv * dv)

  /** Apply a 4x4 homogeneous transform T (row-major Seq of 16 doubles) to a
    * 3D point, dropping w (point3d_transformation.py:109-120: p' = T @ [p;1]).
    */
  def rigidTransform(t: Seq[Double], x: Column, y: Column, z: Column)
      : (Column, Column, Column) = {
    require(t.length == 16)
    def row(i: Int): Column =
      lit(t(i * 4)) * x + lit(t(i * 4 + 1)) * y + lit(t(i * 4 + 2)) * z +
        lit(t(i * 4 + 3))
    (row(0), row(1), row(2))
  }

  /** Rotation matrix from ZYX euler angles in degrees (KUKA A,B,C order;
    * point3d_transformation.py:87-104). R = Rz(a) @ Ry(b) @ Rx(c).
    */
  def eulerZyxToMatrix(aDeg: Column, bDeg: Column, cDeg: Column): Mat3 = {
    val (ca, sa) = (cos(radians(aDeg)), sin(radians(aDeg)))
    val (cb, sb) = (cos(radians(bDeg)), sin(radians(bDeg)))
    val (cc, sc) = (cos(radians(cDeg)), sin(radians(cDeg)))
    Seq(
      Seq(ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc),
      Seq(sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc),
      Seq(-sb, cb * sc, cb * cc))
  }

  /** Rodrigues rotation-vector -> rotation matrix, closed form
    * (extrinsic_calibration.py:76,105: cv2.Rodrigues):
    * R = c I + (1-c) k k^T + s [k]x, with theta = |r|, k = r/theta.
    * The zero rotation vector is a legitimate cv2.Rodrigues input meaning
    * identity, so the guard is built in — theta == 0 yields I, never NaN.
    */
  def rodrigues(rx: Column, ry: Column, rz: Column): Mat3 = {
    val theta = sqrt(rx * rx + ry * ry + rz * rz)
    val (kx, ky, kz) = (rx / theta, ry / theta, rz / theta)
    val c = cos(theta)
    val s = sin(theta)
    val v = lit(1.0) - c
    val raw = Seq(
      Seq(c + kx * kx * v, kx * ky * v - kz * s, kx * kz * v + ky * s),
      Seq(ky * kx * v + kz * s, c + ky * ky * v, ky * kz * v - kx * s),
      Seq(kz * kx * v - ky * s, kz * ky * v + kx * s, c + kz * kz * v))
    raw.zipWithIndex.map { case (row, i) =>
      row.zipWithIndex.map { case (e, j) =>
        when(theta > 0.0, e).otherwise(lit(if (i == j) 1.0 else 0.0))
      }
    }
  }

  /** `eulerZyxToMatrix` with the six trig terms staged as named
    * intermediate columns on `df` — the corpus-scale form.
    *
    * Why a DataFrame-level variant exists: the Column-only helpers build
    * each matrix entry as its own tree, so shared terms (cos/sin of each
    * angle, Rodrigues' sqrt) are textually DUPLICATED into all 9 entries
    * — ~90 transcendental evaluations per row once the 9 entries are
    * selected, and an expression source so large it bloats codegen.
    * Staging the shared terms as real columns lets the optimizer keep
    * them staged (CollapseProject refuses to inline a non-trivial alias
    * referenced more than once), so each computes ONCE per row inside
    * the same whole-stage-codegen pass. Measured on x8 at sf0.1:
    * 15.6 s inline -> 0.23 s staged, bit-identical output (same entry
    * trees, shared terms have one evaluation site but the same value).
    * The Column-only forms above stay for small-cardinality callers
    * (pose grids, per-image calibration).
    */
  def eulerZyxStaged(df: org.apache.spark.sql.DataFrame,
      aDeg: Column, bDeg: Column, cDeg: Column)
      : (org.apache.spark.sql.DataFrame, Mat3) = {
    val staged = df.withColumns(Map(
      "__ca" -> cos(radians(aDeg)), "__sa" -> sin(radians(aDeg)),
      "__cb" -> cos(radians(bDeg)), "__sb" -> sin(radians(bDeg)),
      "__cc" -> cos(radians(cDeg)), "__sc" -> sin(radians(cDeg))))
    val (ca, sa) = (col("__ca"), col("__sa"))
    val (cb, sb) = (col("__cb"), col("__sb"))
    val (cc, sc) = (col("__cc"), col("__sc"))
    (staged, Seq(
      Seq(ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc),
      Seq(sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc),
      Seq(-sb, cb * sc, cb * cc)))
  }

  /** `rodrigues` with theta / k / cos / sin / (1-cos) staged as named
    * intermediate columns — the corpus-scale form (see eulerZyxStaged
    * for why; the sqrt alone appeared ~50x in the inline entry trees).
    *
    * `finish` is applied to each entry INSIDE the zero-theta guard's
    * live branch (the identity constants pass through exactly under any
    * rounding, so finishing only the computed branch is value-identical
    * to finishing the whole CASE). Wrapping the guard from outside
    * instead triples the CASE tree: a finisher like GeoQueries.r6
    * references its argument 3x, and nesting CASE-in-CASE defeated
    * codegen CSE — measured 6.6 s vs 0.9 s on x8 at sf0.1.
    */
  def rodriguesStaged(df: org.apache.spark.sql.DataFrame,
      rx: Column, ry: Column, rz: Column,
      finish: Column => Column = identity)
      : (org.apache.spark.sql.DataFrame, Mat3) = {
    val staged = df
      .withColumn("__th", sqrt(rx * rx + ry * ry + rz * rz))
      .withColumns(Map(
        "__kx" -> (rx / col("__th")), "__ky" -> (ry / col("__th")),
        "__kz" -> (rz / col("__th")),
        "__c" -> cos(col("__th")), "__s" -> sin(col("__th"))))
      .withColumn("__v", lit(1.0) - col("__c"))
    val th = col("__th")
    val (kx, ky, kz) = (col("__kx"), col("__ky"), col("__kz"))
    val (c, s, v) = (col("__c"), col("__s"), col("__v"))
    val raw = Seq(
      Seq(c + kx * kx * v, kx * ky * v - kz * s, kx * kz * v + ky * s),
      Seq(ky * kx * v + kz * s, c + ky * ky * v, ky * kz * v - kx * s),
      Seq(kz * kx * v - ky * s, kz * ky * v + kx * s, c + kz * kz * v))
    (staged, raw.zipWithIndex.map { case (row, i) =>
      row.zipWithIndex.map { case (e, j) =>
        when(th > 0.0, finish(e)).otherwise(lit(if (i == j) 1.0 else 0.0))
      }
    })
  }

  /** Pinhole projection with the rational distortion model actually used by
    * the reference (k1,k2,p1,p2,k4 nonzero; K3..K5 fixed —
    * camera_calib.py:101-102, extrinsic_calibration.py:114-124).
    * Input: camera-frame point (x,y,z), z > 0. Output: (u,v) pixels.
    */
  def projectPoint(
      x: Column, y: Column, z: Column,
      fx: Double, fy: Double, cx: Double, cy: Double,
      k1: Double, k2: Double, p1: Double, p2: Double, k4: Double)
      : (Column, Column) = {
    val xn = x / z
    val yn = y / z
    val r2 = xn * xn + yn * yn
    val radial =
      (lit(1.0) + lit(k1) * r2 + lit(k2) * r2 * r2) / (lit(1.0) + lit(k4) * r2)
    val xd = xn * radial + lit(2.0 * p1) * xn * yn +
      lit(p2) * (r2 + lit(2.0) * xn * xn)
    val yd = yn * radial + lit(p1) * (r2 + lit(2.0) * yn * yn) +
      lit(2.0 * p2) * xn * yn
    (lit(fx) * xd + lit(cx), lit(fy) * yd + lit(cy))
  }

  /** Full cv2 rational-model projection (extrinsic_calibration.py:114-124
    * via cv2.projectPoints): camera-frame (x,y,z) -> pixels, with
    * radial (1 + k1 r² + k2 r⁴ + k3 r⁶)/(1 + k4 r² + k5 r⁴ + k6 r⁶) and
    * tangential p1,p2. `dist` is the OpenCV 14-vector
    * [k1,k2,p1,p2,k3,k4,k5,k6,s1..s4,τx,τy] (s/τ unused — the reference
    * calibrates with CALIB_RATIONAL_MODEL|FIX_K3..K5, camera_calib.py:101,
    * so its only nonzero denominator term is k6 r⁶).
    */
  def projectPointCv(
      x: Column, y: Column, z: Column,
      k: Seq[Double], dist: Seq[Double]): (Column, Column) = {
    require(k.length == 9 && dist.length >= 8)
    val Seq(k1, k2, p1, p2, k3, k4, k5, k6) = dist.take(8)
    val (fx, fy, cx, cy) = (k(0), k(4), k(2), k(5))
    val xn = x / z
    val yn = y / z
    val r2 = xn * xn + yn * yn
    val radial =
      (lit(1.0) + lit(k1) * r2 + lit(k2) * r2 * r2 + lit(k3) * r2 * r2 * r2) /
      (lit(1.0) + lit(k4) * r2 + lit(k5) * r2 * r2 + lit(k6) * r2 * r2 * r2)
    val xd = xn * radial + lit(2.0 * p1) * xn * yn +
      lit(p2) * (r2 + lit(2.0) * xn * xn)
    val yd = yn * radial + lit(p1) * (r2 + lit(2.0) * yn * yn) +
      lit(2.0 * p2) * xn * yn
    (lit(fx) * xd + lit(cx), lit(fy) * yd + lit(cy))
  }

  /** Apply a 3x3 homography (row-major 9 doubles) to a 2D point
    * (image_cut_warp.py:33-36 / cv2.warpPerspective math).
    */
  def homographyApply(h: Seq[Double], u: Column, v: Column)
      : (Column, Column) = {
    require(h.length == 9)
    val w = lit(h(6)) * u + lit(h(7)) * v + lit(h(8))
    ((lit(h(0)) * u + lit(h(1)) * v + lit(h(2))) / w,
      (lit(h(3)) * u + lit(h(4)) * v + lit(h(5))) / w)
  }

  /** Solve the 3x3 homography mapping 4 source points onto 4 destination
    * points (image_cut_warp.py:28-31 / cv2.getPerspectiveTransform).
    *
    * Pure Scala (driver- or executor-side) Gaussian elimination on the
    * standard 8x8 DLT system; used by the homography UDF and tests. Row-major
    * 9-vector result with h22 = 1.
    */
  def solveHomography(src: Seq[(Double, Double)], dst: Seq[(Double, Double)])
      : Array[Double] = {
    require(src.length == 4 && dst.length == 4)
    // A x = b, x = [h00..h21], h22 = 1
    val a = Array.ofDim[Double](8, 9) // augmented
    for (i <- 0 until 4) {
      val (sx, sy) = src(i); val (dx, dy) = dst(i)
      a(2 * i) = Array(sx, sy, 1, 0, 0, 0, -sx * dx, -sy * dx, dx)
      a(2 * i + 1) = Array(0, 0, 0, sx, sy, 1, -sx * dy, -sy * dy, dy)
    }
    // partial-pivot gaussian elimination
    for (col <- 0 until 8) {
      val piv = (col until 8).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      require(math.abs(a(col)(col)) > 1e-12, "degenerate point configuration")
      for (r <- col + 1 until 8) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col until 9) a(r)(c) -= f * a(col)(c)
      }
    }
    val x = new Array[Double](8)
    for (r <- 7 to 0 by -1) {
      var s = a(r)(8)
      for (c <- r + 1 until 8) s -= a(r)(c) * x(c)
      x(r) = s / a(r)(r)
    }
    x :+ 1.0
  }

  /** solveHomography as a Spark UDF: (src array<array<double>> 4x2,
    * dst 4x2) -> array<double> 9, so the solve is reachable from the engine
    * (SQL surface / DataFrame) and not only from driver-side Scala. UDF
    * rather than codegen Expression: it runs once per image group (3,108 in
    * the reference), never per pixel — not a hot path.
    */
  def solveHomographyUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (src: Seq[Seq[Double]], dst: Seq[Seq[Double]]) =>
      solveHomography(
        src.map(p => (p(0), p(1))), dst.map(p => (p(0), p(1)))).toSeq
    }

  /** Elementwise luminance scale x0.9 on an array column
    * (lumiadjust.py:14: pcomb -s 0.9; the pure-Spark semantic form S10/X15).
    */
  def luminanceScale(pixels: Column, factor: Double = 0.9): Column =
    transform(pixels, x => x.cast("double") * lit(factor))

  /** Center crop of a 1-D numeric array: elements [lo, lo+len)
    * 1-based — the generic form of cut600.py:30-32's 800->640 crop.
    */
  def centerCrop(arr: Column, lo: Int, len: Int): Column =
    slice(arr, lo, len)

  /** Column-level SE(3) inverse (point3d_transformation.py:177-191):
    * given per-row rotation columns R (Mat3) and translation columns,
    * returns (R^T, -R^T t) — the per-row form of `se3Inverse`.
    */
  def se3InverseCols(r: Mat3, tx: Column, ty: Column, tz: Column)
      : (Mat3, Seq[Column]) = {
    val rt = Seq.tabulate(3, 3)((i, j) => r(j)(i))
    val nt = Seq.tabulate(3)(i =>
      -(r(0)(i) * tx + r(1)(i) * ty + r(2)(i) * tz))
    (rt, nt)
  }

  /** Closed-form SE(3) inverse of a 4x4 [R|t] (row-major 16)
    * (point3d_transformation.py:177-191, commented variant): R^T, -R^T t.
    */
  def se3Inverse(t: Seq[Double]): Seq[Double] = {
    require(t.length == 16)
    val r = Array(t(0), t(1), t(2), t(4), t(5), t(6), t(8), t(9), t(10))
    val tr = Array(t(3), t(7), t(11))
    def rt(i: Int, j: Int) = r(j * 3 + i) // transpose
    val nt = (0 until 3).map(i => -(rt(i, 0) * tr(0) + rt(i, 1) * tr(1) + rt(i, 2) * tr(2)))
    Seq(
      rt(0, 0), rt(0, 1), rt(0, 2), nt(0),
      rt(1, 0), rt(1, 1), rt(1, 2), nt(1),
      rt(2, 0), rt(2, 1), rt(2, 2), nt(2),
      0.0, 0.0, 0.0, 1.0)
  }
}
