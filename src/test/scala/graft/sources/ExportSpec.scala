package graft.sources

import java.nio.file.Files
import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded export: stable membership across re-exports, complete and
  * readable round-trip, partition-pruned shard reads.
  */
class ExportSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("sharded JSONL round-trips completely with stable shard membership") {
    val dir = Files.createTempDirectory("graft-export").toString
    Export.shardedJsonl(docs, "doc_id", s"$dir/a", nShards = 8)
    val a = spark.read.json(s"$dir/a")
    assert(a.count() === docs.count())
    // every column survives (shard added)
    assert(a.columns.toSet === docs.columns.toSet + "shard")
    // membership is a pure function of the id: a second export after an
    // upstream reorder lands every doc in the SAME shard
    Export.shardedJsonl(docs.orderBy(rand(42)), "doc_id", s"$dir/b", 8)
    val b = spark.read.json(s"$dir/b")
    // partition columns read back as inferred ints
    val am = a.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val bm = b.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    assert(am === bm)
    assert(am.values.toSet.size === 8, "all 8 shards populated")
  }

  test("a single-shard read prunes to that shard's directory") {
    val dir = Files.createTempDirectory("graft-export-p").toString
    Export.shardedParquet(docs, "doc_id", s"$dir/p", nShards = 4)
    val one = spark.read.parquet(s"$dir/p").filter(col("shard") === 2)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
    assert(one.count() > 0)
  }
}
