package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.expr.WinnowFp
import graft.pipeline.Intrinsic

/** ScalaCheck properties for the round-5 pure-Scala kernels: the rolling
  * winnowing fingerprint and the small linear-algebra pieces behind the
  * Zhang calibration composite.
  */
object WinnowProps extends Properties("winnow") {

  private val text = Gen.chooseNum(0, 60).flatMap(n =>
    Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
  private val kGen = Gen.choose(1, 8)
  private val wGen = Gen.choose(1, 6)

  /** Naive reference: recompute each k-gram hash from scratch, take
    * window minima, distinct + sort.
    */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    if (s.length < k) return Seq.empty
    val hs = (0 to s.length - k).map(i =>
      s.substring(i, i + k).foldLeft(0L)((acc, c) => acc * 31 + c))
    if (hs.length < w) return Seq.empty
    (0 to hs.length - w).map(t => hs.slice(t, t + w).min)
      .distinct.sorted
  }

  property("rolling compute equals the from-scratch reference") =
    Prop.forAll(text, kGen, wGen) { (s, k, w) =>
      val got = WinnowFp.compute(UTF8String.fromString(s), k, w)
        .toLongArray().toSeq
      got == reference(s, k, w)
    }

  property("fingerprints are invariant under duplication-adjacent inserts") =
    // winnowing's defining robustness: a fingerprint set of a string is a
    // subset of the fingerprints of any superstring containing it intact
    // (local hashes are unchanged inside the copied region)
    Prop.forAll(text.suchThat(_.length >= 16)) { s =>
      val whole = WinnowFp.compute(UTF8String.fromString(s + "###" + s), 8, 4)
        .toLongArray().toSet
      val part = WinnowFp.compute(UTF8String.fromString(s), 8, 4)
        .toLongArray().toSet
      part.subsetOf(whole)
    }
}

object IntrinsicProps extends Properties("intrinsic-linalg") {

  private val entry = Gen.choose(-10.0, 10.0)

  private def symmetric(n: Int): Gen[Array[Array[Double]]] =
    Gen.listOfN(n * n, entry).map { vs =>
      val m = vs.grouped(n).map(_.toArray).toArray
      Array.tabulate(n, n)((i, j) => (m(i)(j) + m(j)(i)) / 2)
    }

  property("smallestEigvec returns a unit vector minimizing the Rayleigh quotient") =
    Prop.forAll(symmetric(6)) { a =>
      val v = Intrinsic.smallestEigvec(a)
      val norm = math.sqrt(v.map(x => x * x).sum)
      def quad(x: Array[Double]): Double = {
        val ax = a.map(row => row.zip(x).map(p => p._1 * p._2).sum)
        ax.zip(x).map(p => p._1 * p._2).sum / x.map(y => y * y).sum
      }
      val rq = quad(v)
      // no coordinate direction does better (necessary condition that
      // catches sign/indexing bugs without a full eigen reference)
      val best = (0 until 6).map { i =>
        val e = Array.fill(6)(0.0); e(i) = 1.0; quad(e)
      }.min
      math.abs(norm - 1.0) < 1e-9 && rq <= best + 1e-9
    }

  property("solveN solves random well-conditioned systems") = {
    val gen = for {
      diag <- Gen.listOfN(6, Gen.choose(5.0, 20.0))
      off <- Gen.listOfN(36, Gen.choose(-1.0, 1.0))
      x <- Gen.listOfN(6, Gen.choose(-100.0, 100.0))
    } yield (diag, off, x)
    Prop.forAll(gen) { case (diag, off, x) =>
      val a = Array.tabulate(6, 6)((i, j) =>
        (if (i == j) diag(i) else 0.0) + (off(i * 6 + j) + off(j * 6 + i)) / 2)
      val b = a.map(row => row.zip(x).map(p => p._1 * p._2).sum)
      val got = Intrinsic.solveN(a, b)
      got.zip(x).forall { case (g, want) => math.abs(g - want) < 1e-6 }
    }
  }

  property("homographyDLT recovers an exact homography from 20+ points") = {
    val hGen = for {
      a <- Gen.choose(0.8, 1.2); b <- Gen.choose(-0.1, 0.1)
      c <- Gen.choose(-50.0, 50.0); d <- Gen.choose(-0.1, 0.1)
      e <- Gen.choose(0.8, 1.2); f <- Gen.choose(-50.0, 50.0)
      g <- Gen.choose(-1e-4, 1e-4); h <- Gen.choose(-1e-4, 1e-4)
    } yield Array(a, b, c, d, e, f, g, h, 1.0)
    Prop.forAll(hGen) { hTrue =>
      val pts = for (x <- 0 until 5; y <- 0 until 4) yield {
        val (xw, yw) = (x * 50.0, y * 50.0)
        val w = hTrue(6) * xw + hTrue(7) * yw + 1.0
        (xw, yw,
          (hTrue(0) * xw + hTrue(1) * yw + hTrue(2)) / w,
          (hTrue(3) * xw + hTrue(4) * yw + hTrue(5)) / w)
      }
      val got = Intrinsic.homographyDLT(pts)
      hTrue.indices.forall(i => math.abs(got(i) - hTrue(i)) < 1e-6)
    }
  }
}

/** SimHash64.compute vs an independent reference that goes through the
  * md5 HEX STRING (parseUnsignedLong) instead of digest-byte shifting —
  * the two paths only agree if the bit order/endianness is right.
  */
object SimHashProps extends Properties("simhash64") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private val token = Gen.chooseNum(1, 10).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val toks = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, token))

  private def reference(ts: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    ts.foreach { t =>
      md.reset()
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(16)
      val h = java.lang.Long.parseUnsignedLong(hex, 16)
      (0 until 64).foreach(j =>
        counts(j) += (((h >>> (63 - j)) & 1L).toInt << 1) - 1)
    }
    (0 until 64).foldLeft(0L)((acc, j) =>
      if (counts(j) > 0) acc | (1L << (63 - j)) else acc)
  }

  property("compute matches the hex-path majority reference") =
    Prop.forAll(toks) { ts =>
      val arr = new GenericArrayData(
        ts.map(t => UTF8String.fromString(t): Any).toArray)
      graft.expr.SimHash64.compute(arr) == reference(ts)
    }
}
