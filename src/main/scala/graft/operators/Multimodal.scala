package graft.operators

import graft.functions.ContentTypes
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side contract (schema, batch shape, partition isolation) is
  * real and tested; the codec itself is STUBBED with a deterministic fake
  * (this container ships no image/audio libraries). Swap `FakeCodec` for a
  * real decoder without touching the dataflow: the decode stage is
  * `mapPartitions`, one codec instance per partition, never inside
  * Catalyst's reorderable expression space.
  */
object Multimodal {

  /** Typed metadata carried alongside each media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)
  ))

  /** Feature row emitted by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("byte_entropy_q", IntegerType),
    StructField("feature", ArrayType(FloatType))
  ))

  /** The codec seam. A real deployment plugs an image/audio decoder here. */
  trait Codec extends Serializable {
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake: byte-histogram folded to `dim` buckets, L1
    * normalized. Stands in for "decode + embed" with stable output.
    */
  object FakeCodec extends Codec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val h = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val total = math.max(1f, bytes.length.toFloat)
      h.map(_ / total)
    }
  }

  /** Attach media columns to any DF: `media` (binary) + sniffed `format`.
    * In production the binary comes off object storage; here any string
    * column can stand in as bytes.
    */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(bytesCol).cast("binary").as("media"),
      coalesce(ContentTypes.sniffMagicCol(col(bytesCol)),
        lit("application/octet-stream")).as("format"))

  /** Decode + feature-extract stage: one codec per partition, rows stream
    * through in batches. Output schema is `featureSchema`.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      codec: Codec = FakeCodec): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("media"), col("format"))
      .mapPartitions { rows =>
        // codec init happens once per partition (model load, native libs)
        val c = codec
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val safe = if (bytes == null) Array.emptyByteArray else bytes
          val feat = c.features(safe, dim)
          val entropyQ = feat.count(_ > 0f)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
            safe.length, entropyQ, feat.toSeq)
        }
      }(enc)
  }

  /** Frame sampling for video-like media: pick every `stride`-th chunk of
    * `frameBytes` bytes as a pseudo-frame (the plumbing a real frame
    * sampler needs: explode to one row per sampled frame).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col("media")) / frameBytes).cast("int")
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame",
        substr(col("media"), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select(col("media_id"), col("frame_idx"), col("frame"))
  }
}
