package graft

import org.apache.spark.storage.StorageLevel

import graft.ops.Caches

/** Release-scope contract of ops/Caches: releaseAll drops exactly
  * graft's own caches (registry-queued Datasets, `graft:`-named RDDs)
  * and leaves host-application storage alone — the invariant that makes
  * the engine embeddable without stealing the host's cached tables.
  */
class CachesSpec extends SparkSpec {

  test("releaseAll drops graft caches but not host caches") {
    import spark.implicits._
    // host and graft datasets must not canonicalize to the same logical
    // plan (CacheManager matches by canonicalized plan, where column
    // NAMES are normalized away) — different data keeps them distinct
    val host = (1 to 50).toDF("v").cache()
    val hostRdd = spark.sparkContext.parallelize(1 to 100)
      .setName("host-rdd").persist(StorageLevel.MEMORY_ONLY)
    val graftDs = Caches.cached((1 to 100).toDF("g"))
    val graftRdd = Caches.persisted(
      spark.sparkContext.parallelize(1 to 100),
      StorageLevel.MEMORY_ONLY, "spec-probe")
    // materialize all four so blocks actually exist
    host.count(); hostRdd.count(); graftDs.count(); graftRdd.count()

    Caches.releaseAll(spark)

    val persisted = spark.sparkContext.getPersistentRDDs.values.toSeq
    assert(persisted.exists(_.name == "host-rdd"),
      "host RDD must survive releaseAll")
    assert(!persisted.exists(r => Option(r.name).exists(_.startsWith("graft:"))),
      "graft-tagged RDDs must be unpersisted")
    assert(graftDs.storageLevel == StorageLevel.NONE,
      "registry-queued dataset must be unpersisted")
    assert(host.storageLevel != StorageLevel.NONE,
      "host dataset cache must survive releaseAll")

    // second release is a no-op on the already-drained queue
    Caches.releaseAll(spark)
    assert(host.storageLevel != StorageLevel.NONE)

    host.unpersist(blocking = true)
    hostRdd.unpersist(blocking = true)
    assert(Caches.storageEmpty(spark))
  }
}
