package graft

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.V2IWeights

/** Golden test for the VectorToImage generator forward pass
  * (ops/Multimodal.scala, train.py:5-70 at reduced resolution): the
  * fixture's weights + expected pixels were computed by an INDEPENDENT
  * numpy implementation of the same architecture
  * (scripts/gen_v2i_golden.py) — dense/conv/bilinear/sigmoid all
  * re-derived, not transcribed — so agreement means the Scala kernel
  * implements the architecture, not just itself.
  */
class MultimodalSpec extends SparkSpec {

  private def d1(n: JsonNode): Array[Double] = {
    val it = n.elements(); val b = Array.newBuilder[Double]
    while (it.hasNext) b += it.next().asDouble()
    b.result()
  }
  private def d2(n: JsonNode): Array[Array[Double]] = {
    val it = n.elements(); val b = Array.newBuilder[Array[Double]]
    while (it.hasNext) b += d1(it.next())
    b.result()
  }
  private def d3(n: JsonNode): Array[Array[Array[Double]]] = {
    val it = n.elements(); val b = Array.newBuilder[Array[Array[Double]]]
    while (it.hasNext) b += d2(it.next())
    b.result()
  }

  private lazy val (weights, inputs, expected) = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(
      "src/test/resources/fixtures/v2i_golden.json"))
    val w = V2IWeights(
      w1 = d2(root.get("w1")), b1 = d1(root.get("b1")),
      w2 = d2(root.get("w2")), b2 = d1(root.get("b2")),
      conv3 = {
        val it = root.get("conv3").elements()
        val b = Array.newBuilder[Array[Array[Array[Double]]]]
        while (it.hasNext) b += d3(it.next())
        b.result()
      },
      b3 = d1(root.get("b3")),
      head = d1(root.get("head")), headB = root.get("headB").asDouble(),
      grid = root.get("grid").asInt(),
      outSize = root.get("outSize").asInt())
    (w, d2(root.get("inputs")), d2(root.get("expected")))
  }

  test("v2iForward matches the numpy golden to float precision") {
    inputs.zip(expected).zipWithIndex.foreach { case ((x, exp), i) =>
      val got = Multimodal.v2iForward(weights, x)
      assert(got.length == exp.length, s"input $i: pixel count")
      val worst = got.zip(exp).map { case (g, e) => math.abs(g - e) }.max
      assert(worst < 1e-6,
        s"input $i: max |spark - numpy| = $worst (pixels are in [0,1])")
    }
  }

  test("inferImages runs the golden weights through the Spark plumbing") {
    import spark.implicits._
    val poses = inputs.zipWithIndex
      .map { case (v, i) => (i.toLong, v(0), v(1), v(2), v(3), v(4), v(5)) }
      .toSeq.toDF("id", "x", "y", "z", "a", "b", "c")
    val out = Multimodal.inferImages(poses, "id",
      Seq("x", "y", "z", "a", "b", "c"), weights)
      .collect().sortBy(_.id)
    out.zip(expected).foreach { case (img, exp) =>
      assert(img.width == weights.outSize && img.height == weights.outSize)
      val worst = img.pixels.zip(exp).map { case (g, e) =>
        math.abs(g - e) }.max
      assert(worst < 1e-6, s"id ${img.id}: max pixel error $worst")
      assert(math.abs(img.mean - exp.sum / exp.length) < 1e-6)
    }
  }
}
