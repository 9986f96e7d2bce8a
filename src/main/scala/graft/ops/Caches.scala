package graft.ops

import org.apache.spark.sql.SparkSession

/** Deterministic storage release between queries.
  *
  * Two cache classes exist in the engine and each needs its own release
  * path:
  *
  *   1. DataFrame-level `.cache()` (t8's shingle set) — registered in the
  *      session CacheManager, released by `catalog.clearCache()`.
  *   2. RDD-level `.persist()` (Windows.withGlobalRowNumbers' sorted RDD,
  *      kmeansCentroids' vector cache during a build) — invisible to the
  *      CacheManager, released only via `SparkContext.getPersistentRDDs`.
  *
  * A query closure cannot release its own cache after the caller's action
  * (the action happens outside the closure), so long-lived sessions pin
  * one cache + lineage per invocation unless the HARNESS releases between
  * queries. Verify and Bench both call this after every query action; a
  * library user embedding graft in a service should do the same at their
  * request boundary. Safe to call at any point where no query of this
  * session is mid-action: every declared query re-derives its caches from
  * source data, and the sim3 IVF index is deliberately session-free
  * (collected rows, not a cached DataFrame — ops/Similarity.scala) so it
  * survives this call by construction.
  */
object Caches {
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** True when nothing is held in block-manager storage — the post-sweep
    * invariant the test suite pins (storage returns to zero after a full
    * declared-query sweep + releaseAll).
    */
  def storageEmpty(spark: SparkSession): Boolean =
    spark.sparkContext.getPersistentRDDs.isEmpty &&
      !spark.sparkContext.getRDDStorageInfo.exists(_.isCached)
}
