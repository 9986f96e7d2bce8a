package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.Geometry

/** ScalaCheck properties for the pure-Scala geometry kernels
  * (SURVEY.md §5 item 3).
  */
object GeometryProps extends Properties("geometry") {

  private val coord = Gen.choose(0.0, 1000.0)
  private val quad: Gen[Seq[(Double, Double)]] = for {
    xs <- Gen.listOfN(4, coord); ys <- Gen.listOfN(4, coord)
  } yield xs.zip(ys)

  private def nonDegenerate(q: Seq[(Double, Double)]): Boolean = {
    def area(a: (Double, Double), b: (Double, Double), c: (Double, Double)) =
      math.abs((b._1 - a._1) * (c._2 - a._2) - (c._1 - a._1) * (b._2 - a._2))
    q.combinations(3).forall(t => area(t(0), t(1), t(2)) > 1.0)
  }

  property("solveHomography maps src corners onto dst corners") =
    Prop.forAll(quad, quad) { (src, dst) =>
      !(nonDegenerate(src) && nonDegenerate(dst)) || {
        val h = Geometry.solveHomography(src, dst)
        src.zip(dst).forall { case ((u, v), (du, dv)) =>
          val w = h(6) * u + h(7) * v + h(8)
          math.abs((h(0) * u + h(1) * v + h(2)) / w - du) < 1e-5 &&
          math.abs((h(3) * u + h(4) * v + h(5)) / w - dv) < 1e-5
        }
      }
    }

  property("se3Inverse is an involution") = {
    val angle = Gen.choose(-math.Pi, math.Pi)
    val trans = Gen.choose(-100.0, 100.0)
    Prop.forAll(angle, trans, trans, trans) { (a, tx, ty, tz) =>
      // rotation about z by a + translation — a valid SE(3) element
      val (c, s) = (math.cos(a), math.sin(a))
      val t = Seq(
        c, -s, 0.0, tx,
        s, c, 0.0, ty,
        0.0, 0.0, 1.0, tz,
        0.0, 0.0, 0.0, 1.0)
      val back = Geometry.se3Inverse(Geometry.se3Inverse(t))
      t.zip(back).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    }
  }
}
