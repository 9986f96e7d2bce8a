package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Geometry

/** The reference's intrinsic-calibration composite (camera_calib.py:9-131,
  * guard at data_pipeline.py:19-24): chessboard views -> camera matrix K +
  * rational distortion + per-view poses + mean reprojection error, with the
  * final K rescaled by the 0.5 detect scale (camera_calib.py:115-119).
  *
  * Spark-first decomposition:
  *   1. per-view plane->image homographies: distributed `mapGroups` over
  *      the corner table (one group per chessboard view), normalized DLT
  *      least-squares over ALL the view's corners — the Zhang analogue of
  *      cv2.findChessboardCorners feeding calibrateCamera;
  *   2. closed-form K init from the B-matrix constraints of Zhang's method
  *      (the algorithm inside cv2.calibrateCamera's init, public knowledge);
  *      driver-side on #views x 9 doubles;
  *   3. LM bundle polish over [fx,fy,cx,cy,k1,k2,p1,p2,k6] + 6 params/view
  *      — driver-side on the collected per-view point sets. This mirrors
  *      the reference exactly: cv2.calibrateCamera IS a single driver call
  *      over in-memory point lists (SURVEY.md §2.8 "driver-side after Spark
  *      collects per-image point sets"). The collect is bounded by
  *      #views x #corners (15 x 99 here) — intrinsic calibration input is
  *      a handful of chessboard views regardless of corpus scale, so this
  *      is NOT a 100-TB funnel; the 100-TB-sized tables never pass here.
  *   4. mean reprojection error evaluated DISTRIBUTED with the same
  *      Catalyst expressions used everywhere else (Geometry.rodrigues +
  *      projectPointCv), per camera_calib.py:104-113.
  *
  * Distortion parameterization follows the reference's flags
  * (CALIB_RATIONAL_MODEL | FIX_K3..K5, camera_calib.py:101-102): free
  * parameters k1,k2,p1,p2 and k6 (index 7 of the cv2 14-vector), all
  * others pinned to zero.
  */
object Intrinsic {

  /** One view's solved pose. */
  final case class ViewPose(viewId: String, rvec: Seq[Double], tvec: Seq[Double])

  /** Calibration output: K row-major 9 (already rescaled to full
    * resolution), cv2-layout 14-vector dist, per-view poses (at detect
    * scale), and the reference's mean reprojection error (detect scale,
    * camera_calib.py:113).
    */
  final case class Result(k: Seq[Double], dist: Seq[Double],
      views: Seq[ViewPose], meanReprojError: Double)

  /** X13: the chessboard world grid of camera_calib.py:49-51 —
    * np.mgrid[0:w,0:h].T.reshape(-1,2) * square puts corner i at
    * (X, Y) = ((i mod w) * square, (i div w) * square), Z = 0.
    */
  def objectPoints(w: Int, h: Int, square: Double): Seq[(Int, Double, Double)] =
    (0 until w * h).map(i => (i, (i % w) * square, (i / w) * square))

  // ------------------------------------------------------------------
  // small symmetric linear algebra (driver/executor kernels)
  // ------------------------------------------------------------------

  /** Eigenvector of the smallest eigenvalue of a symmetric matrix, by
    * cyclic Jacobi rotations. Sizes here are 9x9 (DLT) and 6x6 (Zhang's
    * V^T V), where Jacobi is exact-enough and dependency-free.
    */
  private[graft] def smallestEigvec(a0: Array[Array[Double]]): Array[Double] = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-30) {
      off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
          val c = 1 / math.sqrt(t * t + 1)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val minIdx = (0 until n).minBy(i => a(i)(i))
    Array.tabulate(n)(k => v(k)(minIdx))
  }

  /** Solve the symmetric positive-definite-ish system A x = b by Gaussian
    * elimination with partial pivoting (generalizes Extrinsic's 6x6 solve
    * to the bundle's 9 + 6V parameters).
    */
  private[graft] def solveN(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (c0 <- 0 until n) {
      val piv = (c0 until n).maxBy(r => math.abs(m(r)(c0)))
      val tmp = m(c0); m(c0) = m(piv); m(piv) = tmp
      require(math.abs(m(c0)(c0)) > 1e-300, "singular normal equations")
      for (r <- c0 + 1 until n) {
        val f = m(r)(c0) / m(c0)(c0)
        for (c <- c0 until n + 1) m(r)(c) -= f * m(c0)(c)
      }
    }
    val x = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = m(r)(n)
      for (c <- r + 1 until n) s -= m(r)(c) * x(c)
      x(r) = s / m(r)(r)
    }
    x
  }

  // ------------------------------------------------------------------
  // 1. per-view DLT homography (distributed)
  // ------------------------------------------------------------------

  /** Least-squares plane->image homography from all of one view's corners
    * (normalized DLT: Hartley-conditioned A^T A, smallest eigenvector).
    * Unlike Geometry.solveHomography (exact 4-point,
    * cv2.getPerspectiveTransform), this is the overdetermined form a
    * chessboard's 99 corners need. Input tuples are (X, Y, u, v).
    */
  def homographyDLT(pts: Seq[(Double, Double, Double, Double)]): Array[Double] = {
    require(pts.length >= 4, "homography needs >= 4 points")
    def conditioner(xs: Seq[Double], ys: Seq[Double]): Array[Double] = {
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val md = xs.zip(ys).map { case (x, y) =>
        math.sqrt((x - mx) * (x - mx) + (y - my) * (y - my))
      }.sum / n
      val s = if (md > 1e-12) math.sqrt(2.0) / md else 1.0
      Array(s, 0, -s * mx, 0, s, -s * my, 0, 0, 1) // row-major 3x3
    }
    val t1 = conditioner(pts.map(_._1), pts.map(_._2))
    val t2 = conditioner(pts.map(_._3), pts.map(_._4))
    def apply3(t: Array[Double], x: Double, y: Double) =
      (t(0) * x + t(1) * y + t(2), t(3) * x + t(4) * y + t(5))
    val ata = Array.ofDim[Double](9, 9)
    def rankUpdate(row: Array[Double]): Unit =
      for (i <- 0 until 9; j <- 0 until 9) ata(i)(j) += row(i) * row(j)
    pts.foreach { case (xw, yw, ui, vi) =>
      val (x, y) = apply3(t1, xw, yw)
      val (u, v) = apply3(t2, ui, vi)
      rankUpdate(Array(x, y, 1, 0, 0, 0, -u * x, -u * y, -u))
      rankUpdate(Array(0, 0, 0, x, y, 1, -v * x, -v * y, -v))
    }
    val hn = smallestEigvec(ata) // row-major normalized H
    // H = T2^-1 Hn T1; T2^-1 for [s,0,tx;0,s,ty;0,0,1] is [1/s,0,-tx/s;...]
    val s2 = t2(0)
    val t2inv = Array(1 / s2, 0, -t2(2) / s2, 0, 1 / s2, -t2(5) / s2, 0, 0, 1)
    def mul3(a: Array[Double], b: Array[Double]): Array[Double] =
      Array.tabulate(9) { k =>
        val (i, j) = (k / 3, k % 3)
        a(i * 3) * b(j) + a(i * 3 + 1) * b(3 + j) + a(i * 3 + 2) * b(6 + j)
      }
    val h = mul3(mul3(t2inv, hn), t1)
    if (math.abs(h(8)) > 1e-12) h.map(_ / h(8)) else h
  }

  /** Distributed per-view homographies: groupByKey(view).mapGroups — each
    * chessboard view is one bounded group (#corners rows), the standard
    * grouped-solve shape shared with Extrinsic.initPnp.
    * Input schema: (view_id, corner_idx, u, v, x, y); output (view_id, h[9]).
    */
  def viewHomographies(corners: DataFrame): DataFrame = {
    val spark = corners.sparkSession
    import spark.implicits._
    corners
      .select(col("view_id"), col("corner_idx"),
        col("u").cast("double"), col("v").cast("double"),
        col("x").cast("double"), col("y").cast("double"))
      .as[(String, Int, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val pts = it.toSeq.sortBy(_._2).map(p => (p._5, p._6, p._3, p._4))
        (id, homographyDLT(pts).toSeq)
      }
      .toDF("view_id", "h")
  }

  // ------------------------------------------------------------------
  // 2. closed-form Zhang init (driver, #views x 9 doubles)
  // ------------------------------------------------------------------

  /** K init from per-view homographies via the image-of-the-absolute-conic
    * constraints (Zhang 2000, the init inside cv2.calibrateCamera).
    * Returns (fx, fy, cx, cy); skew forced to 0 like cv2.
    */
  def zhangInitK(hs: Seq[Array[Double]]): (Double, Double, Double, Double) = {
    require(hs.length >= 2, "Zhang init needs >= 2 views")
    // v_ij built from columns i,j of H (row-major: column c = (h(c),h(3+c),h(6+c)))
    def vij(h: Array[Double], i: Int, j: Int): Array[Double] = {
      val (h1i, h2i, h3i) = (h(i), h(3 + i), h(6 + i))
      val (h1j, h2j, h3j) = (h(j), h(3 + j), h(6 + j))
      Array(h1i * h1j, h1i * h2j + h2i * h1j, h2i * h2j,
        h3i * h1j + h1i * h3j, h3i * h2j + h2i * h3j, h3i * h3j)
    }
    val vtv = Array.ofDim[Double](6, 6)
    def rankUpdate(r: Array[Double]): Unit =
      for (i <- 0 until 6; j <- 0 until 6) vtv(i)(j) += r(i) * r(j)
    hs.foreach { h =>
      rankUpdate(vij(h, 0, 1))
      val v11 = vij(h, 0, 0); val v22 = vij(h, 1, 1)
      rankUpdate(Array.tabulate(6)(i => v11(i) - v22(i)))
    }
    var b = smallestEigvec(vtv)
    if (b(0) < 0) b = b.map(-_) // B must be (proportional to) positive definite
    val Array(b11, b12, b22, b13, b23, b33) = b
    val v0 = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    val lam = b33 - (b13 * b13 + v0 * (b12 * b13 - b11 * b23)) / b11
    require(lam / b11 > 0 && lam * b11 / (b11 * b22 - b12 * b12) > 0,
      "Zhang init: degenerate homography set")
    val alpha = math.sqrt(lam / b11)
    val beta = math.sqrt(lam * b11 / (b11 * b22 - b12 * b12))
    val u0 = -b13 * alpha * alpha / lam // skew = 0
    (alpha, beta, u0, v0)
  }

  /** Per-view [R|t] init from its homography and K: r1 = l K^-1 h1,
    * r2 = l K^-1 h2, r3 = r1 x r2, t = l K^-1 h3; Gram-Schmidt back to
    * SO(3); sign chosen so the board sits in front of the camera (tz > 0).
    */
  def extrinsicFromH(h: Array[Double], fx: Double, fy: Double,
      cx: Double, cy: Double): (Array[Double], Array[Double]) = {
    def kinv(x: Double, y: Double, w: Double) =
      Array((x - cx * w) / fx, (y - cy * w) / fy, w)
    var c1 = kinv(h(0), h(3), h(6))
    var c2 = kinv(h(1), h(4), h(7))
    var t = kinv(h(2), h(5), h(8))
    def nrm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    val l = 2.0 / (nrm(c1) + nrm(c2))
    c1 = c1.map(_ * l); c2 = c2.map(_ * l); t = t.map(_ * l)
    if (t(2) < 0) { c1 = c1.map(-_); c2 = c2.map(-_); t = t.map(-_) }
    val r1 = c1.map(_ / nrm(c1))
    val d = r1(0) * c2(0) + r1(1) * c2(1) + r1(2) * c2(2)
    val o2 = Array.tabulate(3)(i => c2(i) - d * r1(i))
    val r2 = o2.map(_ / nrm(o2))
    val r3 = Array(
      r1(1) * r2(2) - r1(2) * r2(1),
      r1(2) * r2(0) - r1(0) * r2(2),
      r1(0) * r2(1) - r1(1) * r2(0))
    val r = Array(r1(0), r2(0), r3(0), r1(1), r2(1), r3(1), r1(2), r2(2), r3(2))
    (Extrinsic.rodriguesInv(r.toSeq), t)
  }

  // ------------------------------------------------------------------
  // 3. LM bundle polish (driver, bounded by #views x #corners)
  // ------------------------------------------------------------------

  /** Scalar twin of Geometry.projectPointCv for the driver-side bundle:
    * board point (X, Y, 0) -> rotate/translate -> rational-model project.
    * dist8 = [k1,k2,p1,p2,k3,k4,k5,k6].
    */
  def projectCvScalar(fx: Double, fy: Double, cx: Double, cy: Double,
      dist8: Array[Double], r9: Array[Double], t: Array[Double],
      xw: Double, yw: Double): (Double, Double) = {
    val xc = r9(0) * xw + r9(1) * yw + t(0)
    val yc = r9(3) * xw + r9(4) * yw + t(1)
    val zc = r9(6) * xw + r9(7) * yw + t(2)
    val xn = xc / zc; val yn = yc / zc
    val r2 = xn * xn + yn * yn
    val Array(k1, k2, p1, p2, k3, k4, k5, k6) = dist8
    val radial = (1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2) /
      (1 + k4 * r2 + k5 * r2 * r2 + k6 * r2 * r2 * r2)
    val xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    val yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    (fx * xd + cx, fy * yd + cy)
  }

  /** LM over the bundle [fx,fy,cx,cy,k1,k2,p1,p2,k6] ++ 6/view.
    * `viewPts(v)` = that view's (X, Y, u, v) corners. Pure-Scala numeric
    * Jacobian (central differences) — at #views x #corners points this is
    * microseconds per iteration, the same boundary the reference crosses
    * when it hands its point lists to cv2.calibrateCamera.
    */
  def refineBundle(viewPts: IndexedSeq[Seq[(Double, Double, Double, Double)]],
      init: Array[Double], maxIter: Int = 80): Array[Double] = {
    val nViews = viewPts.length
    val nParams = 9 + 6 * nViews
    require(init.length == nParams)

    def residuals(p: Array[Double]): Array[Double] = {
      val dist8 = Array(p(4), p(5), p(6), p(7), 0.0, 0.0, 0.0, p(8))
      val out = Array.newBuilder[Double]
      var v = 0
      while (v < nViews) {
        val base = 9 + 6 * v
        val r9 = Extrinsic.rodriguesScalar(
          Seq(p(base), p(base + 1), p(base + 2)))
        val t = Array(p(base + 3), p(base + 4), p(base + 5))
        viewPts(v).foreach { case (xw, yw, u, vv) =>
          val (up, vp) =
            projectCvScalar(p(0), p(1), p(2), p(3), dist8, r9, t, xw, yw)
          out += (up - u); out += (vp - vv)
        }
        v += 1
      }
      out.result()
    }

    var p = init.clone()
    var r = residuals(p)
    var cost = r.map(x => x * x).sum
    var lambda = 1e-3
    var iter = 0
    var converged = false
    val nRes = r.length
    while (iter < maxIter && !converged) {
      // central-difference Jacobian, step scaled per parameter
      val jac = Array.ofDim[Double](nRes, nParams)
      for (j <- 0 until nParams) {
        val h = 1e-6 * math.max(math.abs(p(j)), 1e-3)
        val pp = p.clone(); pp(j) += h
        val pm = p.clone(); pm(j) -= h
        val rp = residuals(pp); val rm = residuals(pm)
        var i = 0
        while (i < nRes) { jac(i)(j) = (rp(i) - rm(i)) / (2 * h); i += 1 }
      }
      val jtj = Array.ofDim[Double](nParams, nParams)
      val jtr = new Array[Double](nParams)
      var i = 0
      while (i < nRes) {
        val row = jac(i); val ri = r(i)
        var a = 0
        while (a < nParams) {
          jtr(a) += row(a) * ri
          var b = a
          while (b < nParams) { jtj(a)(b) += row(a) * row(b); b += 1 }
          a += 1
        }
        i += 1
      }
      for (a <- 0 until nParams; b <- 0 until a) jtj(a)(b) = jtj(b)(a)

      var accepted = false
      var tries = 0
      while (!accepted && tries < 10) {
        val damped = Array.tabulate(nParams, nParams)((a, b) =>
          jtj(a)(b) + (if (a == b) lambda * math.max(jtj(a)(a), 1e-12) else 0.0))
        val step = solveN(damped, jtr.map(-_))
        val cand = Array.tabulate(nParams)(a => p(a) + step(a))
        val rc = residuals(cand)
        val cc = rc.map(x => x * x).sum
        if (cc < cost) {
          if (cost - cc < 1e-12 * math.max(cost, 1e-12)) converged = true
          p = cand; r = rc; cost = cc
          lambda = math.max(lambda / 3, 1e-12)
          accepted = true
        } else { lambda *= 10; tries += 1 }
      }
      if (!accepted) converged = true
      iter += 1
    }
    p
  }

  // ------------------------------------------------------------------
  // 4. distributed reprojection error + the composite
  // ------------------------------------------------------------------

  /** camera_calib.py:104-113 as a distributed plan: per-view
    * L2-norm-of-residuals / #points, then the mean across views (A4 /
    * A2 two-level shape). All per-point math is Catalyst expressions;
    * the per-view poses ride in on a broadcast join.
    */
  def meanReprojError(corners: DataFrame, k: Seq[Double], dist: Seq[Double],
      views: Seq[ViewPose]): Double = {
    val spark = corners.sparkSession
    import spark.implicits._
    val vdf = views.map(v =>
      (v.viewId, v.rvec(0), v.rvec(1), v.rvec(2),
        v.tvec(0), v.tvec(1), v.tvec(2)))
      .toDF("view_id", "r0", "r1", "r2", "t0", "t1", "t2")
    val j = corners.join(broadcast(vdf), "view_id")
    val m = Geometry.rodrigues(col("r0"), col("r1"), col("r2"))
    val (x, y) = (col("x"), col("y")) // board plane, z = 0
    val xc = m(0)(0) * x + m(0)(1) * y + col("t0")
    val yc = m(1)(0) * x + m(1)(1) * y + col("t1")
    val zc = m(2)(0) * x + m(2)(1) * y + col("t2")
    val (u, v) = Geometry.projectPointCv(xc, yc, zc, k, dist)
    val du = u - col("u"); val dv = v - col("v")
    j.groupBy("view_id")
      .agg((sqrt(sum(du * du + dv * dv)) / count(lit(1))).as("view_err"))
      .agg(avg("view_err")).collect()(0).getDouble(0)
  }

  /** The cam_calib composite (camera_calib.py:95-119). Input: long-form
    * corner table (view_id, corner_idx, u, v, x, y) at DETECT scale (the
    * reference detects on 0.5x images). Output K is rescaled to full
    * resolution by 1/detectScale (X10, camera_calib.py:115-119); dist and
    * the error stay at detect scale exactly like the reference.
    */
  def calibrate(corners: DataFrame, detectScale: Double = 0.5,
      maxIter: Int = 80): Result = {
    // stage 1 (distributed): per-view homographies
    val hs = viewHomographies(corners).collect()
      .map(r => (r.getString(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
      .sortBy(_._1)
    // stage 2 (driver, #views x 9 doubles): closed-form K
    val (fx0, fy0, cx0, cy0) = zhangInitK(hs.map(_._2).toSeq)
    // stage 3: per-view pose init + LM bundle over the collected point
    // sets (bounded: #views x #corners; see object scaladoc)
    val ptsByView: Map[String, Seq[(Double, Double, Double, Double)]] =
      corners.select(col("view_id"), col("x").cast("double"),
          col("y").cast("double"), col("u").cast("double"),
          col("v").cast("double"))
        .collect()
        .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))))
        .groupBy(_._1).map { case (k2, v) => (k2, v.map(_._2).toSeq) }
    val viewIds = hs.map(_._1)
    val init = Array(fx0, fy0, cx0, cy0, 0.0, 0.0, 0.0, 0.0, 0.0) ++
      hs.flatMap { case (_, h) =>
        val (rv, tv) = extrinsicFromH(h, fx0, fy0, cx0, cy0)
        rv ++ tv
      }
    val p = refineBundle(viewIds.toIndexedSeq.map(ptsByView), init, maxIter)
    val views = viewIds.zipWithIndex.map { case (id, i) =>
      val b = 9 + 6 * i
      ViewPose(id, Seq(p(b), p(b + 1), p(b + 2)),
        Seq(p(b + 3), p(b + 4), p(b + 5)))
    }.toSeq
    val kDetect = Seq(p(0), 0.0, p(2), 0.0, p(1), p(3), 0.0, 0.0, 1.0)
    val dist14 = Seq(p(4), p(5), p(6), p(7), 0.0, 0.0, 0.0, p(8),
      0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // stage 4 (distributed): the reference's quality metric
    val err = meanReprojError(corners, kDetect, dist14, views)
    // X10 rescale to full resolution (camera_calib.py:115-119)
    val k = Seq(p(0) / detectScale, 0.0, p(2) / detectScale,
      0.0, p(1) / detectScale, p(3) / detectScale, 0.0, 0.0, 1.0)
    Result(k, dist14, views, err)
  }
}
