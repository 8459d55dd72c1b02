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
}
