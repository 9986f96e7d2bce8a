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
    }
  )

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
    * half-written PNG.
    */
  private lazy val frameFixtures: () => String = () => {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft-px4-frames")
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
