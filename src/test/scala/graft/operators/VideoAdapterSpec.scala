package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** A stand-in whose command is `cat` — the FULL production path
  * (temp-file write, process pipe, exit status, raw-frame parsing)
  * executes on a committed raw-gray fixture, so the adapter's stream
  * parsing is exercised on every image, not only where the ffmpeg
  * binary happens to exist. Top-level (not a spec inner class) so the
  * mapPartitions closure serializes without dragging the spec in.
  */
private[operators] class CatDecoder extends FfmpegDecoder {
  override protected def command(path: String): Seq[String] =
    Seq("cat", path)
}

/** Real-codec scene cuts via the ffmpeg adapter — self-skips when the
  * binary is absent (the soffice/chromium adapter discipline): the
  * fixture is rendered BY ffmpeg (a black second spliced to a white
  * second), so the test is hermetic wherever it runs at all, and the
  * adapter must find exactly the one hard cut at the splice.
  * The cat-backed tests below do NOT skip anywhere — see [[CatDecoder]].
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

  private val fixturePath = "src/test/resources/raw_gray_32x18_4frames.bin"

  test("NO BINARY NEEDED: cat-backed command runs the production " +
      "pipe + raw-frame parsing on the committed fixture — exact " +
      "per-frame energies, stride respected, partial tail frame drops") {
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixturePath))
    assert(raw.length === 4 * 576 + 100) // 4 full frames + partial tail
    val dec = new CatDecoder
    // frame 0 all-zero, frame 1 all-255, frame 2 all-1, frame 3 a
    // 0..255 ramp; the 100-byte tail is not a full 576-byte frame and
    // must be dropped by the nFrames floor
    assert(dec.frameEnergies(raw, stride = 1) ===
      Seq((0, 0L), (1, 146880L), (2, 576L), (3, 67296L)))
    assert(dec.frameEnergies(raw, stride = 2) ===
      Seq((0, 0L), (2, 576L)))
    assert(dec.frameEnergies(raw, stride = 3) ===
      Seq((0, 0L), (3, 67296L)))
  }

  test("NO BINARY NEEDED: the DataFrame plumbing (mapPartitions " +
      "decode, keyed-window cuts) runs end-to-end on the cat adapter") {
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixturePath))
    val s = spark
    import s.implicits._
    val media = Seq((7L, raw)).toDF("media_id", "media")
    val cuts = Video.shotBoundaries(media, new CatDecoder,
        stride = 1, threshold = 100000L)
      .orderBy("frame_idx").collect()
    assert(cuts.length === 4)
    // |0→146880| and |146880→576| exceed the threshold; |576→67296|
    // does not
    assert(cuts.map(_.getAs[Boolean]("is_cut")).toSeq ===
      Seq(false, true, true, false))
    assert(cuts.map(_.getAs[Long]("energy")).toSeq ===
      Seq(0L, 146880L, 576L, 67296L))
  }

  test("NO BINARY NEEDED: non-zero exit and missing binary both take " +
      "the Nil contract through the production error paths") {
    val raw = Array.fill[Byte](700)(3)
    val failing = new FfmpegDecoder {
      override protected def command(path: String): Seq[String] =
        Seq("false") // exits 1 -> the status != 0 branch
    }
    assert(failing.frameEnergies(raw, stride = 1) === Nil)
    val absent = new FfmpegDecoder {
      override protected def command(path: String): Seq[String] =
        Seq("graft-no-such-binary-7f3a", path) // -> IOException branch
    }
    assert(absent.frameEnergies(raw, stride = 1) === Nil)
  }
}
