package graft

import org.apache.spark.sql.functions._

import graft.ops.Hdr

/** Unit tests for the pure-Spark HDR merge (handlehdrgen.py:30-33
  * semantic): synthetic 5-exposure brackets with a scalar reference
  * computation, the <5-exposures skip guard, and the saturated-pixel
  * floor.
  */
class HdrSpec extends SparkSpec {

  private val bracket = Hdr.ExposureBracket

  /** Scalar reference of the merge formula. */
  private def expected(zs: Seq[Seq[Double]]): Seq[Double] = {
    val nPix = zs.head.length
    (0 until nPix).map { j =>
      val terms = zs.zip(bracket).map { case (px, t) =>
        val z = px(j)
        val w = math.max(1e-3, 1.0 - math.abs(2 * z - 1))
        (w * z / t, w)
      }
      terms.map(_._1).sum / terms.map(_._2).sum
    }
  }

  test("mergeGroups matches the scalar weighted-exposure formula") {
    import spark.implicits._
    // 3-pixel images: mid-tones, a dark pixel, and a bright ramp
    val zs = Seq(
      Seq(0.50, 0.10, 0.96),
      Seq(0.25, 0.02, 0.60),
      Seq(0.40, 0.05, 0.80),
      Seq(0.70, 0.20, 0.99),
      Seq(0.90, 0.35, 1.00))
    val rows = zs.zipWithIndex.map { case (px, i) =>
      ("g1", i + 1, bracket(i), px)
    }
    val df = rows.toDF("gid", "slot", "t", "px")
    val out = Hdr.mergeGroups(df, "gid", "slot", "t", "px").collect()
    assert(out.length == 1)
    val got = out(0).getAs[scala.collection.Seq[Double]]("radiance")
    val exp = expected(zs)
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"radiance $g vs $e")
    }
  }

  test("groups with fewer than 5 exposures are skipped (handlehdrgen.py:25-27)") {
    import spark.implicits._
    val full = (1 to 5).map(s => ("full", s, bracket(s - 1), Seq(0.5, 0.5)))
    val short = (1 to 4).map(s => ("short", s, bracket(s - 1), Seq(0.5, 0.5)))
    val df = (full ++ short).toDF("gid", "slot", "t", "px")
    val out = Hdr.mergeGroups(df, "gid", "slot", "t", "px").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("full"))
  }

  test("pixel saturated in every exposure degrades to floor-weighted mean") {
    import spark.implicits._
    val rows = (1 to 5).map(s => ("g", s, bracket(s - 1), Seq(1.0)))
    val df = rows.toDF("gid", "slot", "t", "px")
    val r = Hdr.mergeGroups(df, "gid", "slot", "t", "px")
      .collect()(0).getAs[scala.collection.Seq[Double]]("radiance")(0)
    // all weights hit the 1e-3 floor => radiance = mean(z/t) = mean(1/t)
    val exp = bracket.map(1.0 / _).sum / 5
    assert(math.abs(r - exp) < 1e-9, s"$r vs $exp")
  }

  test("merge is unaffected by input row order (weighted mean commutes)") {
    import spark.implicits._
    val zs = Seq(0.5, 0.25, 0.4, 0.7, 0.9)
    val fwd = zs.zipWithIndex.map { case (z, i) => ("g", i + 1, bracket(i), Seq(z)) }
    val rev = fwd.reverse
    def merge(rows: Seq[(String, Int, Double, Seq[Double])]) =
      Hdr.mergeGroups(rows.toDF("gid", "slot", "t", "px"),
        "gid", "slot", "t", "px")
        .collect()(0).getAs[scala.collection.Seq[Double]]("radiance")(0)
    // plain-sum accumulation order may differ per physical row order, so
    // compare to FP tolerance rather than bit-exactly
    assert(math.abs(merge(fwd) - merge(rev)) < 1e-12)
  }

  test("mergeExploded emits one (group, channel) row per pixel") {
    import spark.implicits._
    val zs = Seq(
      Seq(0.50, 0.10),
      Seq(0.25, 0.02),
      Seq(0.40, 0.05),
      Seq(0.70, 0.20),
      Seq(0.90, 0.35))
    val rows = zs.zipWithIndex.map { case (px, i) =>
      ("g1", i + 1, bracket(i), px)
    }
    val out = Hdr.mergeExploded(rows.toDF("gid", "slot", "t", "px"),
        "gid", "t", "px")
      .orderBy("channel").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("g1", 0), ("g1", 1)))
    val exp = expected(zs)
    out.zip(exp).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(2) - e) < 1e-12)
    }
  }
}
