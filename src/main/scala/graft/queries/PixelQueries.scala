package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Corners, Geometry, Warp, Tables => T}

/** Pixel-kernel query surface — the reference's corner detection
  * (pixel_processing.py:6-64) run end-to-end on REAL rasters inside the
  * engine.
  *
  * The repo's parquet testdata carries no image payloads, so px1 renders
  * its frames deterministically from table keys (one 640×640 synthetic
  * sample photo per nation row — same spirit as the reference's generated
  * chessboard fixtures, train.py:14-40) and the oracle predicts the
  * detected corners in closed form. The prediction is exact because the
  * whole integer pipeline (binomial blur → threshold → close → contour →
  * approxPolyDP) is translation-equivariant: with the rectangle SIZE fixed
  * and only its position varying per row, every row's detected corners are
  * the true corners plus one fixed, size-dependent offset, measured once
  * and pinned in CornersSpec:
  *
  *   blur+threshold grow the 255-rectangle by 1 px per side and chamfer
  *   the 4 corner pixels (corner value 255·(5/16)² = 24.9 < 50); close
  *   with the 5×5 element preserves that shape exactly; approxPolyDP at
  *   ε = 0.02·peri ≈ 25 px collapses the octagon to 4 vertices, one per
  *   chamfer.
  *
  * Scale shape: the kernel runs as a Dataset.map — embarrassingly
  * parallel, no shuffle until the final dim-sized ORDER BY; the 100 TB
  * form is the same map over decoded binary columns
  * (ops/Multimodal.decodeMeta's mapPartitions batching).
  */
object PixelQueries {

  // px1 frame geometry: fixed 340×290 rectangle (peri after growth =
  // 2·(341+291) + 4·(√2−2) ≈ 1258 > the reference's 1000 gate), position
  // keyed off n_nationkey, ≥37 px from every frame edge
  val W = 640
  val RW = 340
  val RH = 290

  def defs: Seq[QueryDef] = Seq(
    QueryDef("px1_corner_detect",
      """SELECT n_nationkey,
        |  40 + 9*(n_nationkey%13) - 1   AS tl_x,
        |  50 + 7*(n_nationkey%17)       AS tl_y,
        |  40 + 9*(n_nationkey%13) + 339 AS tr_x,
        |  50 + 7*(n_nationkey%17) - 1   AS tr_y,
        |  40 + 9*(n_nationkey%13) + 340 AS br_x,
        |  50 + 7*(n_nationkey%17) + 289 AS br_y,
        |  40 + 9*(n_nationkey%13)       AS bl_x,
        |  50 + 7*(n_nationkey%17) + 290 AS bl_y
        |FROM nation ORDER BY n_nationkey""") { (s, d) =>
      import s.implicits._
      nationKeys(s, d)
        .map { k =>
          val x0 = 40 + 9 * (k % 13)
          val y0 = 50 + 7 * (k % 17)
          val gray = Corners.renderRect(W, W, x0, y0, RW, RH)
          val q = Corners.cornerPixelExtract(gray, W, W)
            .getOrElse(sys.error(s"px1: no quadrilateral detected for key $k"))
          (k, q.tlX, q.tlY, q.trX, q.trY, q.brX, q.brY, q.blX, q.blY)
        }
        .toDF("n_nationkey", "tl_x", "tl_y", "tr_x", "tr_y",
          "br_x", "br_y", "bl_x", "bl_y")
        .orderBy("n_nationkey")
    },

    // PX2: chessboard inner-corner detection from pixels — the
    // reference's cv2.resize(0.5) + findChessboardCorners(gray, (9,11))
    // (camera_calib.py:61-71), on one synthetic 640×640 board per nation
    // row. Detection runs in the HALF-scale frame (the reference
    // calibrates in resized coordinates and never scales back); on the
    // block-aligned render every inner corner is the exact midpoint of
    // the two eroded diagonal squares' corners, so the oracle is closed
    // form: corner (i,j) at (x0/2 + (i+1)·20 − 0.5, y0/2 + (j+1)·20 − 0.5)
    // with 40 px squares at origin (x0,y0) = (60+4·(k%11), 40+4·(k%7)).
    // CornersSpec pins the grid-order and exactness over all 25 keys.
    QueryDef("px2_chessboard_detect",
      """SELECT n_nationkey, CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |  30 + 2*(n_nationkey%11) + (i+1)*20 - 0.5 AS cx,
        |  20 + 2*(n_nationkey%7)  + (j+1)*20 - 0.5 AS cy
        |FROM nation,
        |  generate_series(0, 8) t(i), generate_series(0, 10) s(j)
        |ORDER BY n_nationkey, j, i""") { (s, d) =>
      import s.implicits._
      nationKeys(s, d)
        .flatMap { k =>
          val x0 = 60 + 4 * (k % 11)
          val y0 = 40 + 4 * (k % 7)
          val gray = Corners.renderChessboard(W, W, x0, y0, 40)
          val cs = Corners.chessboardCorners(gray, W, W)
            .getOrElse(sys.error(s"px2: chessboard not found for key $k"))
          cs.map(c => (k, c.i, c.j, c.cx, c.cy))
        }
        .toDF("n_nationkey", "i", "j", "cx", "cy")
        .orderBy("n_nationkey", "j", "i")
    },

    // PX3: the reference's full rectification loop on pixels — detect the
    // sample quad (pixel_processing.py), solve the 4-point perspective
    // matrix to a fixed output rect (image_cut_warp.py:28-30
    // getPerspectiveTransform = Geometry.solveHomography), warp the image
    // (image_cut_warp.py:33-36 warpPerspective = ops/Warp), then re-detect
    // on the warped frame. The oracle is exact and closed-form because
    // rectification is the INVARIANT: whatever the quad's position
    // (varying per key), the warped frame is bit-identical — M absorbs
    // the translation, and bilinear sampling positions shift with the
    // content — so the re-detected corners are the output rect's own
    // corners and the bright-pixel count is a constant, both pinned in
    // CornersSpec. src_tl_* carries the per-key varying input so the
    // oracle also checks the pre-warp detection.
    QueryDef("px3_warp_rectify",
      """SELECT n_nationkey,
        |  40 + 9*(n_nationkey%13) - 1 AS src_tl_x,
        |  50 + 7*(n_nationkey%17)     AS src_tl_y,
        |  0 AS w_tl_x, 0 AS w_tl_y, 359 AS w_tr_x, 0 AS w_tr_y,
        |  359 AS w_br_x, 309 AS w_br_y, 0 AS w_bl_x, 309 AS w_bl_y,
        |  110926 AS n_bright
        |FROM nation ORDER BY n_nationkey""") { (s, d) =>
      import s.implicits._
      nationKeys(s, d)
        .map { k =>
          val x0 = 40 + 9 * (k % 13)
          val y0 = 50 + 7 * (k % 17)
          val gray = Corners.renderRect(W, W, x0, y0, RW, RH)
          val q = Corners.cornerPixelExtract(gray, W, W)
            .getOrElse(sys.error(s"px3: no quadrilateral for key $k"))
          val m = Geometry.solveHomography(
            Seq((q.tlX.toDouble, q.tlY.toDouble), (q.trX.toDouble, q.trY.toDouble),
              (q.brX.toDouble, q.brY.toDouble), (q.blX.toDouble, q.blY.toDouble)),
            Seq((0.0, 0.0), (359.0, 0.0), (359.0, 309.0), (0.0, 309.0)))
          val warped = Warp.warpPerspective(gray, W, W, m.toIndexedSeq, 360, 310)
          val wq = Corners.cornerPixelExtract(warped, 360, 310)
            .getOrElse(sys.error(s"px3: no warped quadrilateral for key $k"))
          (k, q.tlX, q.tlY, wq.tlX, wq.tlY, wq.trX, wq.trY,
            wq.brX, wq.brY, wq.blX, wq.blY, warped.count(_ > 128))
        }
        .toDF("n_nationkey", "src_tl_x", "src_tl_y", "w_tl_x", "w_tl_y",
          "w_tr_x", "w_tr_y", "w_br_x", "w_br_y", "w_bl_x", "w_bl_y",
          "n_bright")
        .orderBy("n_nationkey")
    },

    // PX4: the 100 TB form px1's comments promise, as a declared query —
    // REAL image FILES scanned via binaryFile (S1), decoded by the real
    // codec (Codecs.decodeGrayLdr = ImageIO PNG + Rec.601), corners
    // detected on the decoded raster, joined back to the nation dim.
    // Frames are px1's exact geometry written once as PNG fixtures
    // (render → encode → disk; grayscale PNG of equal RGB channels is
    // lossless, pinned in CornersSpec's round-trip test), so the oracle
    // is px1's closed form. Scale shape: binaryFile pre-partitions by
    // file, decode+detect run inside one mapPartitions with no shuffle
    // until the dim-sized broadcast join + final ORDER BY.
    QueryDef("px4_scan_decode_detect",
      """SELECT n_nationkey,
        |  40 + 9*(n_nationkey%13) - 1   AS tl_x,
        |  50 + 7*(n_nationkey%17)       AS tl_y,
        |  40 + 9*(n_nationkey%13) + 339 AS tr_x,
        |  50 + 7*(n_nationkey%17) - 1   AS tr_y,
        |  40 + 9*(n_nationkey%13) + 340 AS br_x,
        |  50 + 7*(n_nationkey%17) + 289 AS br_y,
        |  40 + 9*(n_nationkey%13)       AS bl_x,
        |  50 + 7*(n_nationkey%17) + 290 AS bl_y
        |FROM nation ORDER BY n_nationkey""") { (s, d) =>
      import s.implicits._
      val frames = frameFixtures()
      val detected = graft.ops.Sources
        .binaryScan(s, frames, Some("*.png"))
        .select(regexp_extract(col("path"), "frame_(\\d+)\\.png$", 1)
          .cast("int").as("n_nationkey"), col("content"))
        .as[(Int, Array[Byte])]
        .map { case (k, bytes) =>
          val (w, h, gray) =
            graft.ops.Codecs.decodeGrayLdr(s"frame_$k.png", bytes)
          val q = Corners.cornerPixelExtract(gray, w, h)
            .getOrElse(sys.error(s"px4: no quadrilateral in frame $k"))
          (k, q.tlX, q.tlY, q.trX, q.trY, q.brX, q.brY, q.blX, q.blY)
        }
        .toDF("n_nationkey", "tl_x", "tl_y", "tr_x", "tr_y",
          "br_x", "br_y", "bl_x", "bl_y")
      // inner join against the dim: only keys present in nation survive,
      // and the 25-row side broadcasts
      T.nation(s, d).select(col("n_nationkey").cast("int").as("n_nationkey"))
        .hint("broadcast")
        .join(detected, "n_nationkey")
        .orderBy("n_nationkey")
    },

    // PX5: general-pose chessboard detection — the reference's real
    // calibration workload (`camera_calib.py:61-77`: photographed boards
    // at arbitrary tilt/perspective, resize 0.5 + findChessboardCorners
    // (9,11)), which the axis-aligned px2 detector cannot handle. Each
    // key derives a convex target quad; the board (squares 40 px, bbox
    // (60,40)-(460,520)) is pushed through the unit-square->quad
    // projective map (Heckbert's closed form) and re-detected with
    // Corners.chessboardCornersGeneral.
    //
    // Oracle strategy (§7.4): the closed-form homography uses only
    // +,-,*,/ from integers, so DuckDB computes the BIT-IDENTICAL truth
    // corner positions (tx,ty, r9-rounded, in half-scale detection
    // coords) from the same formulas; the detector itself is verified by
    // `ok` — detected corner within 0.25 half-scale px of the truth
    // (measured worst case over all 25 keys: 0.109 px; a detector
    // regression flips `ok` and fails the hash). A board is
    // 180°-symmetric, so the orientation minimizing the max error is
    // scored, exactly like the reference's unambiguous-corner ordering.
    QueryDef("px5_chessboard_general",
      """WITH q AS (
        |  SELECT n_nationkey,
        |    110 + 3*(n_nationkey%5) AS x00, 55 + 3*(n_nationkey%7)  AS y00,
        |    485 - 2*(n_nationkey%6) AS x10, 100 + 2*(n_nationkey%5) AS y10,
        |    435 - 3*(n_nationkey%4) AS x11, 555 - 2*(n_nationkey%7) AS y11,
        |    75 + 2*(n_nationkey%3)  AS x01, 495 - 3*(n_nationkey%5) AS y01
        |  FROM nation),
        |hm AS (
        |  SELECT *,
        |    ((x00 - x10 + x11 - x01) * (y01 - y11) - (y00 - y10 + y11 - y01) * (x01 - x11))
        |      / ((x10 - x11) * (y01 - y11) - (y10 - y11) * (x01 - x11)) AS g,
        |    ((x10 - x11) * (y00 - y10 + y11 - y01) - (y10 - y11) * (x00 - x10 + x11 - x01))
        |      / ((x10 - x11) * (y01 - y11) - (y10 - y11) * (x01 - x11)) AS hh
        |  FROM q),
        |mm AS (
        |  SELECT n_nationkey, g, hh,
        |    x10 - x00 + g * x10  AS ma, x01 - x00 + hh * x01 AS mb, x00 AS mc,
        |    y10 - y00 + g * y10  AS md, y01 - y00 + hh * y01 AS me, y00 AS mf
        |  FROM hm),
        |grid AS (
        |  SELECT n_nationkey, ma, mb, mc, md, me, mf, g, hh, i, j,
        |    ((i+1)*40 - 0.5) / 400 AS u, ((j+1)*40 - 0.5) / 480 AS v
        |  FROM mm, generate_series(0, 8) t(i), generate_series(0, 10) s(j))
        |SELECT n_nationkey, CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |  0.0 + floor(((ma*u + mb*v + mc) / (g*u + hh*v + 1) - 0.5) / 2 * 1e9 + 0.5) / 1e9 AS tx,
        |  0.0 + floor(((md*u + me*v + mf) / (g*u + hh*v + 1) - 0.5) / 2 * 1e9 + 0.5) / 1e9 AS ty,
        |  TRUE AS ok
        |FROM grid ORDER BY n_nationkey, j, i""") { (s, d) =>
      import s.implicits._
      nationKeys(s, d)
        .flatMap { k =>
          val (hu, m) = px5Homography(k)
          val board = Corners.renderChessboard(W, W, 60, 40, 40)
          val warped = Warp.warpPerspective(board, W, W, m.toIndexedSeq, W, W)
          val det = Corners.chessboardCornersGeneral(warped, W, W)
            .getOrElse(sys.error(s"px5: board not found for key $k"))
          val dm = det.map(c => ((c.i, c.j), (c.cx, c.cy))).toMap
          // truth in half-scale coords, arithmetic ordered as the oracle
          def truth(i: Int, j: Int): (Double, Double) = {
            val u = ((i + 1) * 40 - 0.5) / 400
            val v = ((j + 1) * 40 - 0.5) / 480
            val dd = hu(6) * u + hu(7) * v + 1
            (((hu(0) * u + hu(1) * v + hu(2)) / dd - 0.5) / 2,
              ((hu(3) * u + hu(4) * v + hu(5)) / dd - 0.5) / 2)
          }
          def err(flip: Boolean): Double = (for { j <- 0 until 11; i <- 0 until 9 } yield {
            val (dx, dy) = if (flip) dm((8 - i, 10 - j)) else dm((i, j))
            val (tx, ty) = truth(i, j)
            math.hypot(dx - tx, dy - ty)
          }).max
          val flip = err(flip = true) < err(flip = false)
          for { j <- 0 until 11; i <- 0 until 9 } yield {
            val (dx, dy) = if (flip) dm((8 - i, 10 - j)) else dm((i, j))
            val (tx, ty) = truth(i, j)
            def r9(x: Double): Double = 0.0 + math.floor(x * 1e9 + 0.5) / 1e9
            (k, i, j, r9(tx), r9(ty), math.hypot(dx - tx, dy - ty) < 0.25)
          }
        }
        .toDF("n_nationkey", "i", "j", "tx", "ty", "ok")
        .orderBy("n_nationkey", "j", "i")
    }
  )

  /** px5's key-derived pose: the unit-square→quad projective map
    * (Heckbert closed form — integer corner coords so both engines
    * compute bit-identical doubles) and the full src→dst warp matrix
    * (that map composed with the board-bbox normalizer). Every key's
    * quad is convex and at genuine rotation+perspective (no edge
    * axis-parallel, opposite edges not parallel).
    */
  private def px5Homography(k: Int): (Array[Double], Array[Double]) = {
    val x00 = 110 + 3 * (k % 5); val y00 = 55 + 3 * (k % 7)
    val x10 = 485 - 2 * (k % 6); val y10 = 100 + 2 * (k % 5)
    val x11 = 435 - 3 * (k % 4); val y11 = 555 - 2 * (k % 7)
    val x01 = 75 + 2 * (k % 3); val y01 = 495 - 3 * (k % 5)
    val den = ((x10 - x11) * (y01 - y11) - (y10 - y11) * (x01 - x11)).toDouble
    val g = ((x00 - x10 + x11 - x01) * (y01 - y11) - (y00 - y10 + y11 - y01) * (x01 - x11)) / den
    val h = ((x10 - x11) * (y00 - y10 + y11 - y01) - (y10 - y11) * (x00 - x10 + x11 - x01)) / den
    val hu = Array(
      x10 - x00 + g * x10, x01 - x00 + h * x01, x00.toDouble,
      y10 - y00 + g * y10, y01 - y00 + h * y01, y00.toDouble,
      g, h, 1.0)
    // normalizer N: board coords -> unit square; full warp M = HU · N
    val n = Array(1.0 / 400, 0.0, -60.0 / 400, 0.0, 1.0 / 480, -40.0 / 480, 0.0, 0.0, 1.0)
    val m = new Array[Double](9)
    var r = 0
    while (r < 3) {
      var c = 0
      while (c < 3) {
        m(r * 3 + c) = hu(r * 3) * n(c) + hu(r * 3 + 1) * n(3 + c) + hu(r * 3 + 2) * n(6 + c)
        c += 1
      }
      r += 1
    }
    (hu, m)
  }

  /** The nation keys fanned out one-per-partition for the px kernels.
    * The dim arrives as a single parquet split, which would serialize
    * the per-image work; the earlier `repartition(n)` fan-out bought
    * parallelism at the cost of a full exchange STAGE — ~100 ms of pure
    * scheduling against these sub-second queries. A 25-row dimension is
    * exactly the documented justified driver-side collect (singleton/dim
    * set, VERDICT r11 audit): collect the keys, parallelize one key per
    * partition, zero shuffles before the final dim-sized sort. At real
    * scale the frames arrive pre-partitioned from a binaryFile scan
    * (px4) and no fan-out exists at all.
    */
  private def nationKeys(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Int] = {
    import s.implicits._
    val keys = T.nation(s, d).select(col("n_nationkey").cast("int"))
      .as[Int].collect().sorted
    s.createDataset(s.sparkContext.parallelize(
      keys.toIndexedSeq, math.max(1, keys.length)))
  }

  /** px4's PNG fixture dir: 25 frames (keys 0..24, px1's geometry) under
    * the JVM temp dir, rendered on first use and reused after — the
    * fixture GENERATOR for the scan path, not part of the query's work
    * (a real corpus's image files already exist). Written file-by-file
    * via atomic rename so a concurrent first use cannot observe a
    * half-written PNG. The dir name is versioned by the render content
    * (a hash of key 0's raster plus the geometry constants): stale
    * fixtures from an older checkout with a different render formula
    * land in a DIFFERENT directory instead of being silently reused and
    * surfacing as a confusing px4 hash mismatch.
    */
  // private[graft]: ObjectStoreSpec re-reads the same fixture frames
  // through the graftmock:// scheme to pin decode-through-object-store
  private[graft] lazy val frameFixtures: () => String = () => {
    val tag = {
      val g0 = Corners.renderRect(W, W, 40, 50, RW, RH)
      var hsh = 1469598103934665603L // FNV-1a over the key-0 raster
      var i = 0
      while (i < g0.length) { hsh ^= g0(i); hsh *= 1099511628211L; i += 1 }
      f"${W}x${RW}x${RH}-${hsh & 0xffffffffL}%08x"
    }
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-px4-frames-$tag")
    dir.mkdirs()
    (0 until 25).foreach { k =>
      val f = new java.io.File(dir, s"frame_$k.png")
      if (!f.isFile) {
        val x0 = 40 + 9 * (k % 13)
        val y0 = 50 + 7 * (k % 17)
        val gray = Corners.renderRect(W, W, x0, y0, RW, RH)
        val img = new java.awt.image.BufferedImage(
          W, W, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < gray.length) {
          val v = gray(i)
          img.setRGB(i % W, i / W, (v << 16) | (v << 8) | v)
          i += 1
        }
        val tmp = java.io.File.createTempFile(s"frame_$k", ".tmp", dir)
        javax.imageio.ImageIO.write(img, "png", tmp)
        if (!tmp.renameTo(f) && !f.isFile)
          sys.error(s"px4: could not publish fixture ${f.getPath}")
        tmp.delete() // no-op if the rename won
      }
    }
    dir.getPath
  }
}
