package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.pipeline.DataPipeline

/** End-to-end calibration DAG over the reference fixtures with stage
  * memoization (data_pipeline.py:10-56 guard chain).
  */
class DataPipelineSpec extends SparkSpec {

  test("full DAG materializes all stages and resumes without recompute") {
    val stateDir = Files.createTempDirectory("graft-dag").toString
    val cam = spark.read
      .parquet("src/test/resources/fixtures/camera.parquet").collect()(0)
    def arr(n: String) =
      cam.getAs[scala.collection.Seq[Double]](n).toSeq
    val pix = spark.read
      .parquet("src/test/resources/fixtures/pixel_corners.parquet")

    val t0 = System.nanoTime()
    val out = DataPipeline.run(spark, pix, stateDir, arr("k"), arr("dist"),
      maxIter = 12)
    val coldSecs = (System.nanoTime() - t0) / 1e9

    assert(out("warp_matrices").count() == 3108)
    assert(out("matched_corners").count() == 3108 * 4)
    val ext = out("extrinsic").collect()(0)
    val stats = ext.getAs[scala.collection.Seq[Double]]("stats")
    assert(stats(5) < 60.0, s"pipeline rmse ${stats(5)} not in sane range")

    // resume: everything is materialized; must be much faster and identical
    val t1 = System.nanoTime()
    val again = DataPipeline.run(spark, pix, stateDir, arr("k"), arr("dist"))
    val warmSecs = (System.nanoTime() - t1) / 1e9
    assert(again("extrinsic").collect()(0)
      .getAs[scala.collection.Seq[Double]]("stats") == stats)
    assert(warmSecs < coldSecs / 3,
      s"resume ($warmSecs s) should skip the optimizer (cold $coldSecs s)")
  }

  test("full DAG computes intrinsics as its first stage (data_pipeline.py:19-24)") {
    import spark.implicits._
    import graft.pipeline.{Extrinsic, Intrinsic}
    val stateDir = Files.createTempDirectory("graft-dag-calib").toString
    val pix = spark.read
      .parquet("src/test/resources/fixtures/pixel_corners.parquet")
    // synthesize the chessboard views from the golden npz poses (see
    // IntrinsicSpec for the full-precision golden test; here we check the
    // DAG wiring: k/dist are computed, materialized, and memoized)
    val goldK = spark.read
      .parquet("src/test/resources/fixtures/camera.parquet").collect()(0)
      .getAs[scala.collection.Seq[Double]]("k")
    val objp = Intrinsic.objectPoints(9, 11, 45.0)
    val views = Seq(
      (Seq(0.0964, -0.2723, 0.0787), Seq(-175.0, -201.1, 1745.8)),
      (Seq(-0.2101, -0.1263, 0.0201), Seq(-190.1, -202.2, 1771.7)),
      (Seq(-0.1062, -0.0640, 0.0863), Seq(-157.6, -210.2, 1771.1)),
      (Seq(-0.1629, -0.0579, 0.0065), Seq(-166.6, -186.9, 1767.3)),
      (Seq(0.2406, -0.2368, 0.0855), Seq(-41.4, -188.7, 1611.7)),
      (Seq(0.2514, -0.0346, 0.0581), Seq(-62.3, -187.9, 1643.0)))
    val dist8 = Array(0.0558, 0.5418, -0.0045, -0.0110, 0.0, 0.0, 0.0, -0.2606)
    val calib = views.zipWithIndex.flatMap { case ((rv, tv), i) =>
      val r9 = Extrinsic.rodriguesScalar(rv)
      objp.map { case (ci, xw, yw) =>
        val (u, v) = Intrinsic.projectCvScalar(
          goldK(0) * 0.5, goldK(4) * 0.5, goldK(2) * 0.5, goldK(5) * 0.5,
          dist8, r9, tv.toArray, xw, yw)
        (f"v$i%02d", ci, u, v, xw, yw)
      }
    }.toDF("view_id", "corner_idx", "u", "v", "x", "y")

    val out = DataPipeline.run(spark, pix, calib, stateDir, maxIter = 2)
    assert(out.contains("camera_matrix"))
    val cam = out("camera_matrix").collect()(0)
    val k = cam.getAs[scala.collection.Seq[Double]]("k")
    assert(math.abs(k(0) - goldK(0)) / goldK(0) < 0.01,
      s"computed fx ${k(0)} vs golden ${goldK(0)}")
    assert(out("matched_corners").count() == 3108 * 4)
    // memoized: second run must not recompute the calibration
    val t0 = System.nanoTime()
    val again = DataPipeline.run(spark, pix, calib, stateDir, maxIter = 2)
    assert((System.nanoTime() - t0) / 1e9 < 10.0, "resume should skip stages")
    assert(again("camera_matrix").collect()(0)
      .getAs[scala.collection.Seq[Double]]("k") == k)
  }

  test("sampleFrames slices every-nth fixed-size frame from binary blobs") {
    import spark.implicits._
    val blob = (0 until 100).map(_.toByte).toArray
    val df = Seq(("v.bin", blob, blob.length.toLong))
      .toDF("path", "content", "length")
    val frames = Multimodal.sampleFrames(df, frameBytes = 10, everyNth = 3)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4) // frames 0,3,6,9 of 10
    assert(frames.map(_.getAs[Int]("n")).forall(_ == 10))
  }

  test("resizeMeta rescales decoded dimensions through mapPartitions") {
    import spark.implicits._
    val df = Seq(("a.jpg", Array.fill[Byte](64)(7), 64L))
      .toDF("path", "content", "length")
    val m = Multimodal.resizeMeta(df, targetW = 64).collect()(0)
    assert(m.width == 64 && m.height == 48) // 4:3 stub geometry preserved
  }

  test("inferImages: broadcast weights, per-PARTITION model init") {
    // train.py:5-70's VectorToImage at the seeded reduced resolution;
    // the kernel itself is golden-tested against numpy in MultimodalSpec
    import spark.implicits._
    val poses = spark.range(0, 1000).repartition(8)
      .select(col("id"),
        expr("CAST(id AS DOUBLE)").as("x"), expr("CAST(id*2 AS DOUBLE)").as("y"),
        expr("CAST(id*3 AS DOUBLE)").as("z"), lit(0.1).as("a"),
        lit(0.2).as("b"), lit(0.3).as("c"))
    val inits = spark.sparkContext.longAccumulator("inferInits")
    val w = Multimodal.V2IWeights.seeded()
    val out = Multimodal.inferImages(poses, "id",
      Seq("x", "y", "z", "a", "b", "c"), w, Some(inits)).collect()
    assert(out.length == 1000)
    assert(out.forall(r => r.width == w.outSize && r.height == w.outSize))
    assert(out.forall(r => r.pixels.length == w.outSize * w.outSize))
    assert(out.forall(r => r.mean > 0.0 && r.mean < 1.0), "sigmoid range")
    // the model materializes once per partition, never per row. Spark does
    // not deduplicate accumulator updates from retried/speculative tasks,
    // so tolerate >= 8 (a per-row bug would show 1000, not 8-and-change)
    assert(inits.value >= 8 && inits.value < 1000,
      s"expected ~8 partition inits (one per partition), got ${inits.value}")
    // deterministic: same weights, same input, same output
    val again = Multimodal.inferImages(poses, "id",
      Seq("x", "y", "z", "a", "b", "c"), w).collect()
    assert(out.sortBy(_.id).map(_.mean).toSeq ==
      again.sortBy(_.id).map(_.mean).toSeq)
  }

  test("inferImages produces the reference's full (640,640) shape") {
    // the architecture scales to train.py's native resolution — prove it
    // on a couple of rows (full-res pixel planes are 409,600 floats each)
    import spark.implicits._
    val poses = Seq((0L, 0.5, -1.0, 2.0, 0.1, 0.2, 0.3),
      (1L, -0.5, 1.0, -2.0, 0.3, 0.2, 0.1))
      .toDF("id", "x", "y", "z", "a", "b", "c")
    val w = Multimodal.V2IWeights.seeded(outSize = 640)
    val out = Multimodal.inferImages(poses, "id",
      Seq("x", "y", "z", "a", "b", "c"), w).collect()
    assert(out.forall(r => r.width == 640 && r.height == 640 &&
      r.pixels.length == 640 * 640))
  }
}
