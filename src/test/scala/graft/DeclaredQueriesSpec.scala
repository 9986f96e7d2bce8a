package graft

/** Regression guard for the r10 failure mode: an analysis-time error in any
  * declared query made it silently vanish from the driver's correctness
  * surface (Verify caught the throwable and moved on). Every query in
  * SparkEntry.allDefs must at least ANALYZE against real sf0.001 data —
  * schema drift in the testdata (e.g. events.ts nanos→µs) now fails the
  * suite locally instead of shrinking CORRECTNESS_r{N}.json.
  */
class DeclaredQueriesSpec extends SparkSpec {

  test("every declared query analyzes against sf0.001") {
    val dir = sf("sf0.001")
    val failures = SparkEntry.allDefs.flatMap { q =>
      try { q.fn(spark, dir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"${q.name}: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(3).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} declared queries fail analysis:\n  ${failures.mkString("\n  ")}")
  }

  test("declared query names are unique and each oracle has a query") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
