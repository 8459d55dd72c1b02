package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** ANN behavior at the operator level: exactness of the brute-force path,
  * and recall/cost characteristics of the IVF and LSH approximations
  * against it on the real embeddings table.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val vectors =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k is exact and deterministic") {
    val a = Similarity.neighborsOf(vectors, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    val b = Similarity.neighborsOf(vectors, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.size === 10)
  }

  test("IVF probe answers come from probed lists only, recall grows with nProbe") {
    val query = vectors.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
      query, 10).collect().map(_.getLong(0)).toSet

    def recall(nProbe: Int): Double = {
      val approx = Similarity.ivfTopK(vectors, "vec_id", "embedding",
        query, 10, nLists = 16, nProbe = nProbe)
        .collect().map(_.getLong(0)).toSet
      (approx & exact).size.toDouble / exact.size
    }
    val r2 = recall(2)
    val rAll = recall(16)
    assert(rAll === 1.0) // probing every list degenerates to exact
    assert(r2 <= rAll)
  }

  test("IVF list assignment is total and deterministic") {
    val counts = Similarity.assignLists(vectors, "embedding", nLists = 16)
      .groupBy("list_id").count().collect()
    assert(counts.map(_.getLong(1)).sum === vectors.count())
    val again = Similarity.assignLists(vectors, "embedding", nLists = 16)
      .groupBy("list_id").count().collect()
    assert(counts.map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      again.map(r => r.getInt(0) -> r.getLong(1)).toMap)
  }
}
