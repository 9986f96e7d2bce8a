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
}
