package graft.ops

/** Perspective warp of a grayscale raster — the reference's
  * `act_warp` (`image_cut_warp.py:33-36` `cv2.warpPerspective(image, M,
  * output_size)`), whose matrix comes from the 4-point solve
  * (`image_cut_warp.py:28-30` `getPerspectiveTransform` =
  * graft.ops.Geometry.solveHomography).
  *
  * Semantics match cv2's defaults: INTER_LINEAR inverse mapping with
  * BORDER_CONSTANT 0 — for each destination pixel, the source position is
  * M⁻¹·(x,y,1) projectively normalized, sampled bilinearly with
  * out-of-range neighbors reading as 0. Documented divergence: OpenCV
  * quantizes source coordinates to 1/32 px fixed point with a rounding
  * interpolation table; this kernel samples at exact doubles, so outputs
  * can differ by ±1 gray level at soft edges (never on integer-aligned
  * samples, which is what the engine's exact oracles use).
  */
object Warp {

  /** Inverse of a row-major 3×3 (cofactor expansion). */
  def invert3(m: Seq[Double]): Array[Double] = {
    val Seq(a, b, c, d, e, f, g, h, i) = m.toSeq
    val det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    require(math.abs(det) > 1e-12, s"singular warp matrix, det=$det")
    Array(
      (e * i - f * h) / det, (c * h - b * i) / det, (b * f - c * e) / det,
      (f * g - d * i) / det, (a * i - c * g) / det, (c * d - a * f) / det,
      (d * h - e * g) / det, (b * g - a * h) / det, (a * e - b * d) / det)
  }

  /** dst(x,y) = bilinear(src, M⁻¹·(x,y,1)), zero border, rounded to
    * 0..255. `m` is the FORWARD matrix (src→dst), as cv2 takes it.
    */
  def warpPerspective(gray: Array[Int], w: Int, h: Int, m: Seq[Double],
      ow: Int, oh: Int): Array[Int] = {
    val inv = invert3(m)
    val out = new Array[Int](ow * oh)
    @inline def at(x: Int, y: Int): Double =
      if (x < 0 || x >= w || y < 0 || y >= h) 0.0 else gray(y * w + x).toDouble
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val denom = inv(6) * x + inv(7) * y + inv(8)
        if (math.abs(denom) > 1e-12) {
          val sx = (inv(0) * x + inv(1) * y + inv(2)) / denom
          val sy = (inv(3) * x + inv(4) * y + inv(5)) / denom
          if (sx > -1 && sx < w && sy > -1 && sy < h) {
            val x0 = math.floor(sx).toInt; val y0 = math.floor(sy).toInt
            val fx = sx - x0; val fy = sy - y0
            val v =
              at(x0, y0) * (1 - fx) * (1 - fy) + at(x0 + 1, y0) * fx * (1 - fy) +
                at(x0, y0 + 1) * (1 - fx) * fy + at(x0 + 1, y0 + 1) * fx * fy
            out(y * ow + x) = math.max(0, math.min(255, math.rint(v).toInt))
          }
        }
        x += 1
      }
      y += 1
    }
    out
  }
}
