package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Content-addressed upload file-name construction
  * (reference `base/api_client.py:120-145`), byte-aware:
  *
  *   - name is first trimmed to 200 *characters*, then shrunk 5 chars at a
  *     time until its UTF-8 encoding is ≤ 200 *bytes* (ext4 255-byte limit
  *     headroom);
  *   - then trimmed again so the whole key stays ≤ 1024 bytes (S3 limit),
  *     budgeting `len(prefix) + len(suffix) + len(hash) + len("_.")`;
  *   - final key: `{prefix}/{name}_{hash}{suffix}`.
  *
  * Golden cases: reference `tests/test_api_client.py:122-170`.
  */
object FileNames {

  private def utf8Len(s: String): Int =
    s.getBytes(StandardCharsets.UTF_8).length

  /** Trim to `maxChars` chars then shrink until ≤ `maxBytes` UTF-8 bytes. */
  def byteAwareTrim(name: String, maxChars: Int, maxBytes: Int): String = {
    var out = name.substring(0, math.min(maxChars, name.length))
    while (utf8Len(out) > maxBytes)
      out = out.substring(0, math.max(0, out.length - 5))
    out
  }

  /** Build the upload key exactly as the reference does. */
  def createFileNameForUpload(
      fileHash: String,
      nameWithoutSuffix: String,
      suffix: String,
      s3Prefix: String): String = {
    val fsName = byteAwareTrim(nameWithoutSuffix, 200, 200)
    val maxLen =
      1024 - s3Prefix.length - suffix.length - fileHash.length - 2
    val trimmed = fsName.substring(0, math.min(math.max(0, maxLen), fsName.length))
    s"$s3Prefix/${trimmed}_$fileHash$suffix"
  }

  private val fileNameUdf = udf(
    (hash: String, name: String, suffix: String, prefix: String) =>
      createFileNameForUpload(hash, name, suffix, prefix))

  /** Column form (deterministic scalar). */
  def uploadFileName(hash: Column, name: Column, suffix: Column,
      prefix: Column): Column = fileNameUdf(hash, name, suffix, prefix)
}
