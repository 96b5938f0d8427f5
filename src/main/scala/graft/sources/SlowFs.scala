package graft.sources

import java.net.URI
import org.apache.hadoop.fs.{FSDataInputStream, Path}

/** Local filesystem with a configurable per-`open()` latency — a stand-in
  * for object-store GET latency (S3/GCS first-byte ~20-80 ms), used by
  * [[graft.ObjStoreProbe]] to MEASURE levers that were previously only
  * priced by argument ("a scan is real I/O on an object store"). Only
  * `open` pays the latency: that is the per-object round trip a real
  * store charges; metadata listings are left fast (stores batch them).
  *
  * Register with `fs.slowfs.impl = graft.sources.SlowFs` and address
  * local files as `slowfs:///abs/path`; latency comes from
  * `fs.slowfs.latency.ms` (default 25). */
class SlowFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "slowfs"
  override def getUri: URI = URI.create("slowfs:///")

  private def latencyMs: Long =
    Option(getConf).map(_.getLong("fs.slowfs.latency.ms", 25L)).getOrElse(25L)

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    Thread.sleep(latencyMs)
    super.open(f, bufferSize)
  }
}
