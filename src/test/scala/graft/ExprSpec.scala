package graft

import graft.expr.GraftFunctions
import graft.ops.Geometry

/** Native SolveHomography expression: registry + SQL surface parity with
  * the Scala solve (SURVEY.md §4 item 1).
  */
class ExprSpec extends SparkSpec {

  test("solve_homography is callable from SQL and matches the Scala solve") {
    GraftFunctions.register(spark)
    val sql = """
      SELECT solve_homography(
        array(array(12d, 34d), array(780d, 20d), array(790d, 770d),
              array(15d, 800d)),
        array(array(0d, 0d), array(800d, 0d), array(800d, 800d),
              array(0d, 800d))) AS h"""
    val got = spark.sql(sql).collect()(0)
      .getAs[scala.collection.Seq[Double]]("h").toSeq
    val want = Geometry.solveHomography(
      Seq((12.0, 34.0), (780.0, 20.0), (790.0, 770.0), (15.0, 800.0)),
      Seq((0.0, 0.0), (800.0, 0.0), (800.0, 800.0), (0.0, 800.0))).toSeq
    got.zip(want).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$a vs $b")
    }
    assert(got.last == 1.0)
  }

  test("solve_homography null input yields null, wrong arity is an error") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT solve_homography(CAST(NULL AS ARRAY<ARRAY<DOUBLE>>), " +
        "array(array(0d,0d), array(1d,0d), array(1d,1d), array(0d,1d)))")
      .collect()(0)
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT solve_homography(array(array(0d,0d)))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("argument") ||
      err.getMessage.contains("solve_homography"))
  }
}
