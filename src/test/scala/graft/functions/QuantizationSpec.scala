package graft.functions

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** int8 scalar quantization: bounded reconstruction error, full int8
  * range use, zero-vector safety.
  */
class QuantizationSpec extends SparkSpec {

  private val VF = VectorFunctions

  test("round-trip error is bounded by scale/2 per element; extremes " +
      "hit ±127") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 2.0f)),   // maxabs 2.0
      (2L, Array(0.001f, 0.002f, -0.003f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))     // zero vector
    ).toDF("vec_id", "embedding")
    val q = df
      .withColumn("scale", VF.quantScale(col("embedding")))
      .withColumn("q", VF.quantizeWith(col("embedding"), col("scale")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getSeq[Int](3), r.getSeq[Float](1))))
      .toMap

    val (s1, q1, v1) = q(1L)
    assert(q1.max === 127 && q1.min === -127,
      s"extremes must map to full range: $q1")
    v1.zip(q1).foreach { case (x, qi) =>
      assert(math.abs(qi * s1 - x) <= s1 / 2 + 1e-12,
        s"reconstruction error above scale/2 for $x -> $qi at scale $s1")
    }
    val (s3, q3, _) = q(3L)
    assert(s3 === 0.0 && q3.forall(_ === 0), "zero vector must be safe")
  }

  test("quantized codes are stable under repartitioning") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def codes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("scale", VF.quantScale(col("embedding")))
      .withColumn("q", VF.quantizeWith(col("embedding"), col("scale")))
      .select(col("vec_id"), col("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(docs) === codes(docs.repartition(9)))
  }
}
