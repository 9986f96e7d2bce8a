package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.ops.Sources

/** Object-store execution smoke test (round-15 verdict gap #2: every
  * committed record runs on file://, while at 100 TB the corpus lives in
  * object storage). A real s3a endpoint is unavailable offline, so
  * [[MockObjectStoreFileSystem]] stands in: a credential-gated FileSystem
  * under its own scheme whose initialize fails unless the SESSION's
  * Hadoop conf (impl + token) actually reaches it. This pins, with a real
  * failure mode, the `binaryPrefixScan` SerializableConfiguration
  * broadcast that round 15 fixed blind (ops/Sources.scala:40-56): a
  * regression back to task-side `new Configuration()` makes these reads
  * throw the credential error asserted in the negative test below.
  */
class ObjectStoreSpec extends SparkSpec {

  private lazy val store: String = {
    val dir = Files.createTempDirectory("graft-objstore")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3, 4, 5, 6))
    Files.write(dir.resolve("b.bin"), Array[Byte](9, 8, 7))
    Files.write(dir.resolve("c.txt"), "hello".getBytes("UTF-8"))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftmock.impl", classOf[MockObjectStoreFileSystem].getName)
    // no FS-instance caching: every getFileSystem(conf) must re-run the
    // credential check against the conf it was HANDED, or the negative
    // test below would silently hit a cached authenticated instance
    hc.set("fs.graftmock.impl.disable.cache", "true")
    hc.set("fs.graftmock.token", "sesame")
    s"graftmock://bucket$dir"
  }

  test("binaryScan lists an object-store scheme through the session conf") {
    val got = Sources.binaryScan(spark, store)
      .select("path", "length").collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1))).sorted
    assert(got.toSeq == Seq(("a.bin", 6L), ("b.bin", 3L), ("c.txt", 5L)))
    // listing results must stay in-scheme (readable via the same FS)
    val paths = Sources.binaryScan(spark, store)
      .select("path").collect().map(_.getString(0))
    assert(paths.forall(_.startsWith("graftmock://bucket/")), paths.toSeq)
  }

  test("binaryPrefixScan reads object-store prefixes on executors") {
    val got = Sources.binaryPrefixScan(spark, store, maxBytes = 4)
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]]("prefix").toSeq))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a.bin", 6L, Seq[Byte](1, 2, 3, 4)),
      ("b.bin", 3L, Seq[Byte](9, 8, 7)),
      ("c.txt", 5L, "hell".getBytes("UTF-8").toSeq)))
  }

  test("a declared query runs unchanged on the object-store scheme") {
    store // force registration
    // the s1 dir-scan query takes the corpus dir as an opaque path and
    // projects path-prefix-free columns, so the SAME QueryDef must
    // return row-identical results whether the corpus is addressed via
    // file:// or an object-store scheme — the property that lets a user
    // point the engine at s3a://bucket/corpus with no code change
    val q = SparkEntry.queries("s1_binary_scan")
    val viaFile = q(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val viaStore = q(spark, "graftmock://bucket/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(viaStore.nonEmpty && viaStore == viaFile)
  }

  test("a task-side fresh Configuration fails loudly (the fixed bug)") {
    store // force registration + fixture creation
    // the pre-fix binaryPrefixScan resolved `new Configuration()` per
    // task: default resources only — no impl mapping, no credentials.
    // With the impl present but the credential absent, the store must
    // refuse; this is what every task would hit on a real s3a deployment
    val bare = new Configuration(false)
    bare.set("fs.graftmock.impl",
      classOf[MockObjectStoreFileSystem].getName)
    bare.set("fs.graftmock.impl.disable.cache", "true")
    val e = intercept[java.io.IOException] {
      new Path(s"$store/a.bin").getFileSystem(bare)
    }
    assert(e.getMessage.contains("missing credential fs.graftmock.token"))
  }
}
