package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed loading of `.npy` embedding artifacts (the reference's
  * `indexer_input/{id}.npy` cache format) into a DataFrame of
  * `(doc_id, embedding: array<float>, shape: array<int>)`.
  *
  * Built on Spark's `binaryFile` source so listing, partitioning, and
  * pushdown (pathGlobFilter, modifiedAfter) come from the built-in
  * connector; only the npy header decode is ours. At 100 TB the file
  * listing parallelizes through the InMemoryFileIndex and each task
  * decodes its own files — no driver-side I/O.
  */
object NpyDataFrames {

  /** Read every `*.npy` under `dir`. 2-D arrays yield one row per
    * document with the flattened data plus its shape (callers slice rows
    * out with `slice(embedding, i*dim+1, dim)` as needed).
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npy")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val (data, shape) = Npy.read(bytes)
        val name = path.substring(path.lastIndexOf('/') + 1)
        val docId = name.stripSuffix(".npy")
        (docId, data, shape.toArray)
      }
      .toDF("doc_id", "embedding", "shape")
  }
}
