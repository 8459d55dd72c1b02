package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec scene cuts via the ffmpeg adapter — self-skips when the
  * binary is absent (the soffice/chromium adapter discipline): the
  * fixture is rendered BY ffmpeg (a black second spliced to a white
  * second), so the test is hermetic wherever it runs at all, and the
  * adapter must find exactly the one hard cut at the splice.
  */
class VideoAdapterSpec extends SparkSpec {

  private def fixture(): Array[Byte] = {
    import scala.sys.process._
    val out = java.nio.file.Files.createTempFile("vfix_", ".mp4")
    java.nio.file.Files.deleteIfExists(out)
    val cmd = Seq("ffmpeg", "-v", "error",
      "-f", "lavfi", "-i", "color=black:s=64x36:d=1:r=8",
      "-f", "lavfi", "-i", "color=white:s=64x36:d=1:r=8",
      "-filter_complex", "[0:v][1:v]concat=n=2:v=1[v]",
      "-map", "[v]", out.toString)
    assert(cmd.!(ProcessLogger(_ => ())) == 0, "fixture render failed")
    val bytes = java.nio.file.Files.readAllBytes(out)
    java.nio.file.Files.deleteIfExists(out)
    bytes
  }

  test("ffmpeg adapter: a black|white splice yields exactly one cut " +
      "at the boundary frame; energies are dark-then-bright") {
    assume(FfmpegDecoder.available, "ffmpeg not on this machine")
    val s = spark
    import s.implicits._
    val media = Seq((1L, fixture())).toDF("media_id", "media")
    val cuts = Video.shotBoundaries(media, new FfmpegDecoder(),
        stride = 1, threshold = 50000L)
      .orderBy("frame_idx").collect()
    assert(cuts.length === 16, s"expected 16 frames, got ${cuts.length}")
    val cutFrames = cuts.filter(_.getAs[Boolean]("is_cut"))
      .map(_.getAs[Int]("frame_idx")).toSeq
    assert(cutFrames === Seq(8), s"cuts at $cutFrames")
    // dark half well below bright half at 32x18 gray (576 px * 255)
    assert(cuts.take(8).forall(_.getAs[Long]("energy") < 30000L))
    assert(cuts.drop(8).forall(_.getAs[Long]("energy") > 120000L))
  }

  test("undecodable bytes drop (Nil contract), never throw") {
    assume(FfmpegDecoder.available, "ffmpeg not on this machine")
    val s = spark
    import s.implicits._
    val media = Seq((1L, Array.fill[Byte](128)(7)))
      .toDF("media_id", "media")
    assert(Video.frameEnergies(media, new FfmpegDecoder()).count() === 0L)
  }
}
