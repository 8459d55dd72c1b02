package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Balanced sharding: exact serpentine rank semantics, the balance
  * property vs hash sharding, tie determinism, and repartition
  * invariance of the two-level rank device.
  */
class ShardingSpec extends SparkSpec {

  test("serpentine deal on a hand-checkable weight ladder") {
    val s = spark
    import s.implicits._
    // weights 8..1, ids 1..8, 3 shards: ranks deal 0,1,2 then 2,1,0...
    val docs = (1L to 8L).map(i => (i, 9L - i)).toDF("id", "w")
    val out = Sharding.assignBalancedShards(docs, "id", "w", nShards = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Int]("shard"))).toMap
    assert(out(1L) === (1L, 0)); assert(out(2L) === (2L, 1))
    assert(out(3L) === (3L, 2)); assert(out(4L) === (4L, 2))
    assert(out(5L) === (5L, 1)); assert(out(6L) === (6L, 0))
    assert(out(7L) === (7L, 0)); assert(out(8L) === (8L, 1))
    // shard token masses: s0 = 8+3+2, s1 = 7+4+1, s2 = 6+5
    val prof = Sharding.shardProfile(
        Sharding.assignBalancedShards(docs, "id", "w", 3), "w")
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("total_weight"))
      .toMap
    assert(prof === Map(0 -> 13L, 1 -> 12L, 2 -> 11L))
  }

  test("ties order by id; assignment invariant under repartition") {
    val s = spark
    import s.implicits._
    val docs = (1L to 100L).map(i => (i, 7L)).toDF("id", "w")
    val a = Sharding.assignBalancedShards(docs, "id", "w", 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank"))
      .toMap
    // all-equal weights: rank == id order exactly
    assert((1L to 100L).forall(i => a(i) === i))
    val b = Sharding.assignBalancedShards(
        docs.repartition(13), "id", "w", 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank"))
      .toMap
    assert(a === b)
  }

  test("corpus balance beats hash sharding; spread within one doc") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("w",
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long"))
    val nShards = 8
    val prof = Sharding.shardProfile(
        Sharding.assignBalancedShards(docs, "doc_id", "w", nShards), "w")
      .collect().map(_.getAs[Long]("total_weight"))
    assert(prof.length === nShards)
    val maxW = docs.agg(max(col("w"))).head().getLong(0)
    assert(prof.max - prof.min <= maxW,
      s"serpentine spread ${prof.max - prof.min} exceeds one max doc $maxW")
    val hashProf = docs
      .withColumn("shard", pmod(hash(col("doc_id")), lit(nShards)))
      .groupBy("shard").agg(sum(col("w")).as("tw"))
      .collect().map(_.getAs[Long]("tw"))
    assert(prof.max - prof.min <= hashProf.max - hashProf.min,
      "balanced sharding should not lose to hash sharding")
  }
}
