package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only object-store stand-in for the g8 S3A configuration path:
  * a FileSystem registered purely through Hadoop conf
  * (`fs.mock3a.impl`), resolved inside TASKS by
  * `Path.getFileSystem(conf)` exactly as `s3a://` URIs are, that
  * records the endpoint/credentials configuration it was initialized
  * with. `mock3a://<bucket>/<abs-local-path>` serves bytes from the
  * local path (the authority plays the bucket role and is ignored for
  * IO), so a listing test exercises the full conf→scheme→FileSystem
  * injection chain with zero network — the same chain a real
  * deployment uses to point g8 at a bucket with a custom endpoint and
  * anonymous credentials (reference main.rs:254-263). Recording is a
  * JVM-static, which local-mode tests can read back; on a real
  * cluster the same init happens per executor.
  */
class Mock3aFileSystem extends RawLocalFileSystem {
  private var uri: URI = _

  override def getScheme: String = "mock3a"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    Mock3aFileSystem.record(
      bucket = name.getAuthority,
      endpoint = conf.get("fs.mock3a.endpoint"),
      credsProvider = conf.get("fs.mock3a.aws.credentials.provider"),
      pathStyle = conf.get("fs.mock3a.path.style.access"))
  }

  override def getUri: URI = uri

  // strip scheme/authority: the path component is the local path
  override def pathToFile(path: Path): java.io.File = {
    val p = path.toUri.getPath
    new java.io.File(p)
  }

  // guard: the superclass constructor calls makeQualified before
  // initialize has set the uri
  override def makeQualified(path: Path): Path =
    if (uri == null || path.toUri.getScheme != null) path
    else new Path(uri.toString + path.toUri.getPath)
}

object Mock3aFileSystem {
  @volatile var seen: Option[(String, String, String, String)] = None
  private[graft] def record(bucket: String, endpoint: String,
      credsProvider: String, pathStyle: String): Unit =
    seen = Some((bucket, endpoint, credsProvider, pathStyle))
}
