package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Tiny-JSON sidecar I/O through the Hadoop FileSystem API, so index
  * metadata lands NEXT TO the data on whatever filesystem the index path
  * names (`hdfs://`, `s3a://`, plain local). `java.nio` would resolve any
  * non-local scheme against the driver's local disk — the sidecar either
  * fails to write or lands somewhere the reader never looks, silently
  * breaking the "metadata rides WITH the index" invariant the persisted
  * dedup/IVF layouts depend on.
  *
  * Sidecars are bounded facts (a layout modulus, a k×dim centroid
  * matrix), so a driver-side read/write of the whole body is correct.
  */
object Sidecar {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Overwrite `path` with `body` (UTF-8) on the path's own filesystem. */
  def write(spark: SparkSession, path: String, body: String): Unit = {
    val p = new Path(path)
    val out = fsFor(spark, p).create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The UTF-8 body at `path`, or None when no such file exists. */
  def read(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsFor(spark, p)
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0L, buf)
      finally in.close()
      Some(new String(buf, StandardCharsets.UTF_8))
    }
  }
}
