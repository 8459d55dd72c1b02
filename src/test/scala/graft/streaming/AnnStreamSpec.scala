package graft.streaming

import java.nio.file.Files

import graft.ingest.SparkSpec
import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming vectors against a persisted IVF index: arriving re-embeds of
  * indexed content flag immediately, and the streaming result equals the
  * batch computation on the same input (statelessness).
  */
// top-level: encoder generation cannot reach a spec-inner class
case class AnnVec(vec_id: Long, embedding: Seq[Float])

class AnnStreamSpec extends SparkSpec {

  private lazy val vectors =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("arriving copies of indexed vectors match themselves; the stream " +
      "result equals the batch result row-for-row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 4, iters = 1)
    val dir = Files.createTempDirectory("graft-annstream").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dir, cents)

    // stream five re-embeds of indexed vectors (ids offset by 10000)
    val arrivals = vectors.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
      .as[AnnVec].collect().toSeq

    val mem = MemoryStream[AnnVec]
    val q = AnnStream.indexMatches(mem.toDF(), dir, "vec_id", "embedding",
        threshold = 0.999)
      .writeStream.format("memory").queryName("ann_matches")
      .outputMode(OutputMode.Append()).start()
    mem.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()

    val out = s.sql("SELECT * FROM ann_matches").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("index_id")))
    // each copy matches at least its own original (cos = 1 at nProbe=1:
    // an identical vector assigns to the identical list)
    (0L until 5L).foreach { i =>
      assert(out.contains((i + 10000L, i)),
        s"copy of $i did not match itself: ${out.toSeq}")
    }

    // statelessness: identical rows from the batch form of the same op
    val batch = AnnStream.indexMatches(
        vectors.filter(col("vec_id") < 5)
          .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")),
        dir, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("index_id")))
    assert(out.toSet === batch.toSet)
    assert(out.length === batch.length)
  }
}
