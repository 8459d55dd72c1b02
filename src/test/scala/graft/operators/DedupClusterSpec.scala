package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Transitive-closure dedup: known edge topologies must produce exact
  * components, and the end-to-end corpus dedup must mark one canonical
  * doc per cluster.
  */
class DedupClusterSpec extends SparkSpec {

  test("connectedComponents closes chains and keeps components separate") {
    val s = spark
    import s.implicits._
    // chain 1-2-3-4, pair 10-11, triangle 20-21-22 (redundant edge)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a_id", "b_id")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    // single-task union-find path (default: edge count under threshold)
    val local = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === expected)
    // distributed label-propagation path (forced with localThreshold=0)
    val dist = Dedup.connectedComponents(pairs, "a_id", "b_id",
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === expected)
  }

  test("dedupCorpus marks exactly one canonical doc per cluster") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val deduped = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.9)
    assert(deduped.count() === docs.count())
    val perCluster = deduped.groupBy("component")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .collect()
    assert(perCluster.forall(_.getAs[Long]("n_canon") === 1L))
    // canonical id is the cluster id itself (min id by construction)
    assert(deduped.filter(col("is_canonical") &&
      col("doc_id") =!= col("component")).count() === 0)
  }
}
