package graft

import org.apache.spark.sql.Row
import graft.pipeline.Extrinsic

/** Golden tests for the extrinsic composite (SURVEY.md §5.2): the shipped
  * fixtures from the reference's own output (data.pkl / camera_extrinsic
  * .npz) must reproduce reprojection_stats through OUR evaluation DAG.
  */
class ExtrinsicSpec extends SparkSpec {

  private lazy val fixtures = "src/test/resources/fixtures"
  private lazy val cam: Row =
    spark.read.parquet(s"$fixtures/camera.parquet").collect()(0)
  private def arr(name: String): Seq[Double] =
    cam.getAs[scala.collection.Seq[Double]](name).toSeq
  private lazy val corners = Extrinsic.loadCorners(spark, fixtures)

  test("golden: stored extrinsic reproduces reprojection_stats to 1e-6") {
    // the npz stats were computed from rvec/tvec (cv2.projectPoints);
    // the separately-stored 4x4 diverges from Rodrigues(rvec) at ~1e-6,
    // so the golden path goes through the parameters
    val stats = Extrinsic.reprojectionStats(
      corners, arr("k"), arr("dist"),
      Extrinsic.paramsToT(arr("rvec") ++ arr("tvec")))
    val want = Map(
      "mean_error" -> cam.getAs[Double]("stat_mean"),
      "std_error" -> cam.getAs[Double]("stat_std"),
      "max_error" -> cam.getAs[Double]("stat_max"),
      "min_error" -> cam.getAs[Double]("stat_min"),
      "median_error" -> cam.getAs[Double]("stat_median"),
      "rmse" -> cam.getAs[Double]("stat_rmse"))
    want.foreach { case (k, v) =>
      assert(math.abs(stats(k) - v) < 1e-6,
        s"$k: got ${stats(k)}, want $v (diff ${stats(k) - v})")
    }
  }

  test("rodrigues scalar twin matches the stored rvec->extrinsic rotation") {
    val r = Extrinsic.rodriguesScalar(arr("rvec"))
    val t = arr("extrinsic")
    val stored = Seq(t(0), t(1), t(2), t(4), t(5), t(6), t(8), t(9), t(10))
    // the reference wrote the 4x4 and the rvec through different code
    // paths; they agree only to ~1e-6 in the npz itself
    r.zip(stored).foreach { case (a, b) =>
      assert(math.abs(a - b) < 2e-6, s"$a vs $b")
    }
    // the log map inverts our own exp map exactly — including theta ~ pi
    val back = Extrinsic.rodriguesInv(r.toSeq)
    back.zip(arr("rvec")).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"roundtrip $a vs $b")
    }
  }

  test("LM refinement from a perturbed start reaches the stored optimum") {
    val rvec = arr("rvec"); val tvec = arr("tvec")
    val perturbed = Seq(rvec(0) + 0.02, rvec(1) - 0.015, rvec(2) + 0.01,
      tvec(0) + 8.0, tvec(1) - 6.0, tvec(2) + 15.0)
    val c = corners.cache()
    val (p, _) = Extrinsic.refine(c, arr("k"), arr("dist"), perturbed)
    val rmse = Extrinsic.reprojectionStats(
      c, arr("k"), arr("dist"), Extrinsic.paramsToT(p))("rmse")
    val storedRmse = cam.getAs[Double]("stat_rmse")
    assert(rmse <= storedRmse + 1e-3,
      s"refined rmse $rmse vs stored $storedRmse")
  }

  test("planar-PnP init (mapGroups) lands close enough for refinement") {
    val c = corners.cache()
    val init = Extrinsic.initPnp(c, arr("k"))
    // init must be in the basin: within 200mm translation / 0.2rad of
    // truth. Compare as ROTATIONS (near theta=pi the rvec representation
    // is antipodally ambiguous — +pi*k and -pi*k are the same rotation).
    val tvec = arr("tvec")
    val rInit = Extrinsic.rodriguesScalar(init.take(3))
    val rTrue = Extrinsic.rodriguesScalar(arr("rvec"))
    val relTrace = (0 until 3).map(i =>
      (0 until 3).map(j => rInit(j * 3 + i) * rTrue(j * 3 + i)).sum).sum
    val angDiff = math.acos(((relTrace - 1) / 2).max(-1.0).min(1.0))
    assert(angDiff < 0.2, s"rotation diff $angDiff rad")
    (0 until 3).foreach(i => assert(math.abs(init(3 + i) - tvec(i)) < 200.0,
      s"tvec[$i] init ${init(3 + i)} vs ${tvec(i)}"))
    val (p, _) = Extrinsic.refine(c, arr("k"), arr("dist"), init)
    val rmse = Extrinsic.reprojectionStats(
      c, arr("k"), arr("dist"), Extrinsic.paramsToT(p))("rmse")
    assert(rmse <= cam.getAs[Double]("stat_rmse") + 1e-3,
      s"end-to-end rmse $rmse")
  }
}
