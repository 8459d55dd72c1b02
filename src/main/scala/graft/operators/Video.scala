package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Real video decode behind the scene-cut family — the C3/C4 adapter
  * pattern (see [[graft.ingest.Converter]]): the JVM has no built-in
  * video codec, so decoding is an interface with a process-backed
  * production adapter (ffmpeg on the executor image) and the
  * deterministic byte-chunk stand-in ([[Multimodal.sampleFrames]]) as
  * the hermetic default. The Spark-side plumbing — per-asset frame
  * explode, keyed-window consecutive-frame delta, threshold cuts — is
  * identical whichever decoder is plugged in; only the per-frame
  * energy source changes.
  *
  * 100 TB shape: decode runs inside `mapPartitions` (one decoder
  * process per task, assets stream through it row by row — no driver
  * involvement, no shuffle added by the decode itself); the windowed
  * delta stays partitioned by asset. Frame features are one LONG per
  * sampled frame, so a petabyte of video reduces to gigabytes of
  * feature rows before the first shuffle.
  */
trait VideoDecoder extends Serializable {
  /** Decode `bytes`, sample every `stride`-th frame, and return
    * `(frame_idx, luma_energy)` pairs — frame_idx in DECODE order
    * (0, stride, 2·stride, …), energy = sum of the frame's gray
    * pixel values at the adapter's fixed analysis resolution.
    * Undecodable assets return Nil (the row drops, mirroring the
    * null-feature contract of [[Multimodal.imageMeta]]).
    */
  def frameEnergies(bytes: Array[Byte], stride: Int): Seq[(Int, Long)]
}

/** Production adapter: ffmpeg decodes the asset to raw 32×18 grayscale
  * frames on a pipe (`-f rawvideo -pix_fmt gray`), one 576-byte frame
  * per step; every `stride`-th frame's byte sum is its energy. The
  * binary must exist on the executor image — [[FfmpegDecoder.available]]
  * probes for it, and specs self-skip without it (the
  * [[graft.ingest.ProcessConverter]] discipline).
  */
class FfmpegDecoder extends VideoDecoder {
  import scala.sys.process._

  /** The decode command for `path`. Overridable so the spec's
    * cat-backed stand-in (piping a committed raw-frame fixture) runs
    * the FULL production path below — temp-file write, process pipe,
    * exit-status handling, raw-frame parsing — even on images without
    * the ffmpeg binary; only the codec itself is substituted.
    */
  protected def command(path: String): Seq[String] =
    Seq("ffmpeg", "-v", "error", "-i", path,
      "-vf", "scale=32:18", "-f", "rawvideo", "-pix_fmt", "gray",
      "pipe:1")

  override def frameEnergies(bytes: Array[Byte],
      stride: Int): Seq[(Int, Long)] = {
    require(stride >= 1, s"bad stride $stride")
    // pipe in via a temp file: many containers (mp4 with a trailing
    // moov atom) are not streamable on stdin, and the file form is
    // seekable — the robust path for arbitrary crawled assets
    val tmp = java.nio.file.Files.createTempFile("vdec_", ".bin")
    try {
      java.nio.file.Files.write(tmp, bytes)
      val out = new java.io.ByteArrayOutputStream()
      val cmd = command(tmp.toString)
      val status = (cmd #> out).!(ProcessLogger(_ => ()))
      if (status != 0) Nil
      else {
        val raw = out.toByteArray
        val frameBytes = 32 * 18
        val nFrames = raw.length / frameBytes
        (0 until nFrames by stride).map { f =>
          var s = 0L
          var i = f * frameBytes
          val end = i + frameBytes
          while (i < end) { s += (raw(i) & 0xff); i += 1 }
          (f, s)
        }
      }
    } catch {
      case _: java.io.IOException => Nil
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}

object FfmpegDecoder {
  /** True when the ffmpeg binary answers on this machine. */
  lazy val available: Boolean =
    try {
      import scala.sys.process._
      Seq("ffmpeg", "-version").!(ProcessLogger(_ => ())) == 0
    } catch { case _: java.io.IOException => false }
}

object Video {

  /** Per-frame energies via a pluggable [[VideoDecoder]]: one decoder
    * per partition, assets stream through `mapPartitions`, output is
    * `(media_id, frame_idx, energy)` — the codec-backed replacement
    * for [[Multimodal.sampleFrames]]'s byte-chunk energies, same
    * downstream shape.
    */
  def frameEnergies(media: DataFrame, decoder: VideoDecoder,
      stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val rows = media.select(col("media_id").cast("long"), col("media"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          decoder.frameEnergies(r.getAs[Array[Byte]](1), stride)
            .iterator.map { case (f, e) => Row(id, f, e) }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Shot boundaries over real decoded frames: the
    * [[Multimodal.shotBoundaries]] keyed-window delta + threshold on
    * [[frameEnergies]] output. Per-asset sequential state only.
    */
  def shotBoundaries(media: DataFrame, decoder: VideoDecoder,
      stride: Int = 4, threshold: Long = 300): DataFrame = {
    require(threshold >= 0, s"bad threshold $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameEnergies(media, decoder, stride)
      .withColumn("delta",
        col("energy") - lag(col("energy"), 1).over(w))
      .withColumn("is_cut",
        coalesce(abs(col("delta")) >= threshold, lit(false)))
      .select(col("media_id"), col("frame_idx"), col("energy"),
        col("delta"), col("is_cut"))
  }
}
