package graft

import java.io.File
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test double for an object store (s3a/abfs-shaped): a Hadoop
  * FileSystem under its own scheme (`graftmock://bucket/...`) that
  * REFUSES to initialize unless the credential key
  * `fs.graftmock.token=sesame` is present in the Configuration it is
  * handed — exactly how a real s3a client fails when task-side code
  * resolves `new Configuration()` instead of the session's Hadoop conf
  * (the ops/Sources.scala binaryPrefixScan round-15 fix this double
  * exists to pin). Paths map identically onto the local filesystem
  * (`graftmock://bucket/abs/path` ⇄ `/abs/path`), so listing, status and
  * positional reads exercise the real RawLocalFileSystem I/O code.
  *
  * Register per session via Hadoop conf keys:
  *   fs.graftmock.impl = classOf[MockObjectStoreFileSystem].getName
  *   fs.graftmock.impl.disable.cache = true   (conf must be re-checked
  *                                             per getFileSystem call)
  *   fs.graftmock.token = sesame
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: URI = URI.create("graftmock://bucket/")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    if (conf.get("fs.graftmock.token") != "sesame")
      throw new java.io.IOException(
        "graftmock: missing credential fs.graftmock.token — the caller " +
          "resolved a Configuration without the session's settings")
    super.initialize(uri, conf)
  }

  // identity mapping: the graftmock path IS the local absolute path.
  // RawLocalFileSystem qualifies listing results against getUri/working
  // dir, so returned paths keep the graftmock://bucket prefix and remain
  // readable through this filesystem.
  override def pathToFile(path: Path): File =
    new File(path.toUri.getPath)

  override def getWorkingDirectory: Path = new Path("graftmock://bucket/")

  override def setWorkingDirectory(dir: Path): Unit = ()
}
