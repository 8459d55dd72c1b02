package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal plumbing contract: schema/batch shape of the codec
  * stage and the frame-sampling explode — the parts that stay when the
  * stub codec is swapped for a real decoder.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
    "doc_id", "text")

  test("asMedia produces binary media with a sniffed-or-default format") {
    val row = media.head()
    assert(row.getAs[Array[Byte]]("media").nonEmpty)
    assert(row.getAs[String]("format") === "application/octet-stream")
    assert(media.schema("media").dataType.typeName === "binary")
  }

  test("extractFeatures emits the declared schema, one row per media") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
    assert(feats.schema === Multimodal.featureSchema)
    assert(feats.count() === media.count())
    val f = feats.head()
    assert(f.getAs[Seq[Float]]("feature").length === 8)
    // L1-normalized histogram sums to ~1
    assert(math.abs(f.getAs[Seq[Float]]("feature").map(_.toDouble).sum - 1.0) < 1e-3)
  }

  test("sampleFrames explodes strided fixed-size chunks with indices") {
    val frames = Multimodal.sampleFrames(media.limit(5),
      frameBytes = 32, stride = 4)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 4 === 0)
      assert(r.getAs[Array[Byte]]("frame").length <= 32)
    }
    // every sampled media contributes at least the frame at index 0
    assert(frames.filter(col("frame_idx") === 0).count() === 5)
  }

  test("real PNG round trip: encodePng bytes sniff as image/png, " +
      "ImageIO meta reads the true dimensions, and the codec returns " +
      "the exact pixel values back") {
    val s = spark
    import s.implicits._
    val px = Seq(0.0, 17.0, 34.9, 51.0, 68.0, 85.0, 102.0, 119.0,
      136.0, 153.0, 170.0, 187.0, 204.0, 221.0, 238.0, 255.0)
    val df = Seq((7L, px)).toDF("id", "pixels")
    val png = Multimodal.encodePng(df, "id", "pixels", side = 4)
    val media = Multimodal.asMedia(png, "media_id", "media")
    assert(media.head().getAs[String]("format") === "image/png")

    val meta = Multimodal.decodeImageMeta(media).head()
    assert(meta.getAs[Int]("width") === 4)
    assert(meta.getAs[Int]("height") === 4)
    assert(meta.getAs[Int]("n_frames") === 1)

    val feats = Multimodal.extractFeatures(media, dim = 16,
      codec = Multimodal.ImageIoCodec).head()
    val want = px.map(v => math.floor(v).toFloat)
    assert(feats.getAs[scala.collection.Seq[Float]]("feature")
        .toSeq === want,
      "PNG is lossless: pooled 4x4 features must equal the pixels")
  }

  test("rowInkProfile: exact per-row ink from the decoded raster — " +
      "ink = sum(255 - gray); undecodable media drop") {
    val s = spark
    import s.implicits._
    // 2x2 image: row 0 = [0, 255] -> ink 255 + 0 = 255; row 1 =
    // [255, 255] -> ink 0
    val df = Seq((3L, Seq(0.0, 255.0, 255.0, 255.0))).toDF("id", "px")
    val media = Multimodal.asMedia(
      Multimodal.encodePng(df, "id", "px", side = 2),
      "media_id", "media")
    val prof = Multimodal.rowInkProfile(media).collect()
      .map(r => (r.getAs[Int]("row_idx"),
        (r.getAs[Int]("width"), r.getAs[Long]("ink")))).toMap
    assert(prof === Map(0 -> ((2, 255L)), 1 -> ((2, 0L))))
    // junk bytes decode to nothing and emit nothing
    val junk = Seq((9L, Array[Byte](1, 2, 3), "application/octet-stream"))
      .toDF("media_id", "media", "format")
    assert(Multimodal.rowInkProfile(junk).count() === 0L)
    // the column transpose: col 0 = [0, 255] -> 255; col 1 = [255,
    // 255] -> 0 (same image, X instead of Y)
    val cprof = Multimodal.colInkProfile(media).collect()
      .map(r => (r.getAs[Int]("col_idx"),
        (r.getAs[Int]("height"), r.getAs[Long]("ink")))).toMap
    assert(cprof === Map(0 -> ((2, 255L)), 1 -> ((2, 0L))))
    assert(Multimodal.colInkProfile(junk).count() === 0L)
  }

  test("real WAV round trip: javax.sound encodes/decodes PCM16 " +
      "losslessly, WavCodec returns exact per-window sample sums, " +
      "headers carry the true format") {
    val s = spark
    import s.implicits._
    val samples = Seq(0.0, 100.0, -100.0, 32767.0, -32768.0, 7.9,
      -7.9, 12345.0)
    val wav = Multimodal.encodeWavPcm16(
      Seq((3L, samples)).toDF("id", "samples"), "id", "samples")
    val meta = Multimodal.decodeAudioMeta(wav).head()
    assert(meta.getAs[String]("encoding") === "PCM_SIGNED")
    assert(meta.getAs[Int]("sample_rate") === 8000)
    assert(meta.getAs[Int]("channels") === 1)
    assert(meta.getAs[Long]("n_frames") === 8L)

    // dim = n samples -> each window is one sample, exactly
    val f = Multimodal.extractFeatures(
        Multimodal.asMedia(wav, "media_id", "media"), dim = 8,
        codec = Multimodal.WavCodec).head()
      .getAs[scala.collection.Seq[Float]]("feature")
    // floor() quantization: 7.9 -> 7, -7.9 -> -8
    assert(f.toSeq === Seq(0f, 100f, -100f, 32767f, -32768f, 7f,
      -8f, 12345f))

    // junk falls back to the byte histogram
    val junk = "not audio".getBytes("UTF-8")
    assert(Multimodal.WavCodec.features(junk, 4).toSeq ===
      Multimodal.FakeCodec.features(junk, 4).toSeq)
    val jm = Multimodal.decodeAudioMeta(Multimodal.asMedia(
      Seq((4L, "junk")).toDF("id", "b"), "id", "b")).head()
    assert(jm.isNullAt(jm.fieldIndex("sample_rate")))
  }

  test("resizeImages: exact block-average thumbnails, undecodable " +
      "rows dropped") {
    val s = spark
    import s.implicits._
    val px = (0 until 16).map(i => (i * 10).toDouble)
    val png = Multimodal.encodePng(Seq((1L, px)).toDF("id", "pixels"),
      "id", "pixels", side = 4)
    val media = Multimodal.asMedia(png, "media_id", "media")
    val thumb = Multimodal.asMedia(
      Multimodal.resizeImages(media, targetSide = 2),
      "media_id", "media")
    assert(thumb.head().getAs[String]("format") === "image/png")
    val meta = Multimodal.decodeImageMeta(thumb).head()
    assert(meta.getAs[Int]("width") === 2)
    assert(meta.getAs[Int]("height") === 2)
    val f = Multimodal.extractFeatures(thumb, dim = 4,
        codec = Multimodal.ImageIoCodec).head()
      .getAs[scala.collection.Seq[Float]]("feature")
    // blocks (0+10+40+50)/4=25, (20+30+60+70)/4=45, 105, 125
    assert(f.toSeq === Seq(25f, 45f, 105f, 125f))

    val junk = Multimodal.asMedia(
      Seq((9L, "junk")).toDF("id", "b"), "id", "b")
    assert(Multimodal.resizeImages(junk, 2).count() === 0L)
  }

  test("ImageIoCodec pools larger rasters by exact cell averages and " +
      "falls back to the byte histogram on undecodable bytes") {
    val s = spark
    import s.implicits._
    // 4x4 image pooled to a 2x2 grid (dim=4): each cell is the mean
    // of its 2x2 block
    val px = (0 until 16).map(i => (i * 10).toDouble)
    val png = Multimodal.encodePng(Seq((1L, px)).toDF("id", "pixels"),
      "id", "pixels", side = 4)
    val media = Multimodal.asMedia(png, "media_id", "media")
    val f = Multimodal.extractFeatures(media, dim = 4,
      codec = Multimodal.ImageIoCodec).head()
      .getAs[scala.collection.Seq[Float]]("feature")
    // block means: (0+10+40+50)/4=25, (20+30+60+70)/4=45, ...
    assert(f.toSeq === Seq(25f, 45f, 105f, 125f))

    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.ImageIoCodec.features(junk, 8).toSeq ===
      Multimodal.FakeCodec.features(junk, 8).toSeq)
    val junkMeta = Multimodal.decodeImageMeta(Multimodal.asMedia(
      Seq((2L, "junk")).toDF("id", "b"), "id", "b")).head()
    assert(junkMeta.isNullAt(junkMeta.fieldIndex("width")))
  }

  test("audioFrameFeatures: exact per-frame energy and frame-local " +
      "zero crossings off a real WAV round trip, short last frame kept") {
    val s = spark
    import s.implicits._
    // 10 samples framed at 4: frames [3,-3,3,-3], [3,-3,3,-3], [5,5]
    val samples = Seq(3.0, -3.0, 3.0, -3.0, 3.0, -3.0, 3.0, -3.0, 5.0, 5.0)
    val wav = Multimodal.encodeWavPcm16(
      Seq((1L, samples)).toDF("id", "sm"), "id", "sm")
    val out = Multimodal.audioFrameFeatures(wav, frameLen = 4)
      .orderBy("frame_idx").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Int]("n_samples")).toSeq === Seq(4, 4, 2))
    assert(out.map(_.getAs[Long]("energy")).toSeq ===
      Seq(36L, 36L, 50L)) // 4*9, 4*9, 2*25
    // 3 crossings inside each full frame; the frame boundary crossing
    // (-3 -> 3 between frames 0 and 1) is NOT counted — frame-local
    assert(out.map(_.getAs[Int]("zero_crossings")).toSeq === Seq(3, 3, 0))

    val junk = Multimodal.asMedia(
      Seq((9L, "junk")).toDF("id", "b"), "id", "b")
    assert(Multimodal.audioFrameFeatures(junk, 4).count() === 0L)
  }

  test("shotBoundaries: energy deltas between SAMPLED frames, first " +
      "frame never a cut, summary accounts scenes") {
    val s = spark
    import s.implicits._
    // 9 frames of 64 bytes: 'a'x4 frames, 'b'x4, 'z'x1; stride 4
    // samples frames 0, 4, 8 -> energies 6208, 6272, 7808;
    // deltas null, 64, 1536 -> one cut at threshold 100
    val text = "a" * 256 + "b" * 256 + "z" * 64
    val media = Multimodal.asMedia(
      Seq((1L, text)).toDF("id", "b"), "id", "b")
    val rows = Multimodal.shotBoundaries(media, frameBytes = 64,
        stride = 4, threshold = 100)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 4, 8))
    assert(rows.map(_.getAs[Long]("energy")).toSeq ===
      Seq(64L * 97, 64L * 98, 64L * 122))
    assert(rows.map(_.getAs[Boolean]("is_cut")).toSeq ===
      Seq(false, false, true))
    val sum = Multimodal.sceneSummary(media, 64, 4, 100).head()
    assert(sum.getAs[Long]("n_frames") === 3L)
    assert(sum.getAs[Long]("n_cuts") === 1L)
    assert(sum.getAs[Long]("n_scenes") === 2L)
    // short media: single truncated frame, no predecessor, no cut
    val short = Multimodal.asMedia(
      Seq((2L, "hello")).toDF("id", "b"), "id", "b")
    val sr = Multimodal.shotBoundaries(short, 64, 4, 0).collect()
    assert(sr.length === 1)
    assert(sr.head.getAs[Boolean]("is_cut") === false)
    assert(sr.head.getAs[Long]("energy") ===
      "hello".map(_.toLong).sum)
  }
}
