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

  test("IVF full probe is exact; partial probe answers come from probed lists only") {
    val query = vectors.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
      query, 10).collect().map(_.getLong(0)).toSet

    // probing every list degenerates to exact search
    val full = Similarity.ivfTopK(vectors, "vec_id", "embedding",
      query, 10, nLists = 16, nProbe = 16)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)

    // partial probe: answers must be confined to ≤ nProbe assigned lists
    // — the pruning contract that distinguishes IVF from a scan — and
    // the query's own best list must be among them (the query vector IS
    // vec_id 0, so id 0 always survives probing)
    val approx2 = Similarity.ivfTopK(vectors, "vec_id", "embedding",
      query, 10, nLists = 16, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx2.nonEmpty)
    assert(approx2.contains(0L))
    val assignments = Similarity.assignLists(vectors, "embedding", 16)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val answerLists = approx2.map(assignments)
    assert(answerLists.size <= 2,
      s"answers spanned lists $answerLists — pruning is not happening")
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
