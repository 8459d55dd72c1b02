package graft.ingest

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-storage access through the Hadoop FileSystem API, so every
  * location is a generic URI — `file://` in tests, `s3a://` (or any other
  * connector) in production. Replaces the reference's cloudpathlib S3Path
  * calls (`base/utils.py:55-61`, `base/api_client.py:164-215`,
  * `base/updated_document_actions.py:342-450`).
  *
  * All writes overwrite in place: combined with content-hash keys (C7/C8)
  * this makes Spark task retries idempotent (SURVEY.md §4 retry note).
  */
object Storage extends Serializable {

  def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  def exists(path: String, conf: Configuration): Boolean =
    fs(path, conf).exists(new Path(path))

  def readString(path: String, conf: Configuration): String =
    new String(readBytes(path, conf), StandardCharsets.UTF_8)

  def readBytes(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val in = fs(path, conf).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def writeString(path: String, text: String, conf: Configuration): Unit =
    writeBytes(path, text.getBytes(StandardCharsets.UTF_8), conf)

  def writeBytes(path: String, data: Array[Byte], conf: Configuration): Unit = {
    val p = new Path(path)
    val out = fs(path, conf).create(p, true)
    try out.write(data)
    finally out.close()
  }

  /** Existence-guarded rename (reference `updated_document_actions.py:415-450`):
    * missing source → benign no-op (None); failure → error message string.
    * Parent dirs of the target are created first (Hadoop rename does not).
    */
  def rename(src: String, dst: String, conf: Configuration): Option[String] =
    try {
      val f = fs(src, conf)
      val srcPath = new Path(src)
      if (f.exists(srcPath)) {
        val dstPath = new Path(dst)
        if (dstPath.getParent != null) f.mkdirs(dstPath.getParent)
        // cloud-store rename overwrites; RawLocalFileSystem refuses an
        // existing target — normalize to overwrite semantics
        if (f.exists(dstPath)) f.delete(dstPath, false)
        if (!f.rename(srcPath, dstPath))
          return Some(s"rename failed: $src -> $dst")
      }
      None
    } catch {
      case e: Exception => Some(e.toString)
    }

  /** Recursive listing of file paths under a prefix (test/report helper). */
  def listFiles(root: String, conf: Configuration): Seq[String] = {
    val f = fs(root, conf)
    val p = new Path(root)
    if (!f.exists(p)) return Nil
    val it = f.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) out += it.next().getPath.toString
    out.toSeq
  }
}
