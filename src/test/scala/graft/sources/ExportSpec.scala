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

  test("manifest verifies a complete export and catches tampering") {
    val dir = Files.createTempDirectory("graft-export").toString
    Export.shardedParquetWithManifest(docs, "doc_id", s"$dir/m", nShards = 4)
    val data = spark.read.parquet(s"$dir/m")
    val manifest = spark.read.parquet(s"$dir/m.manifest")
    assert(manifest.count() === 4)
    // recompute the digest from what was actually written: must match
    val recomputed = Export.manifestOf(data.drop("shard"), "doc_id", 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val declared = manifest
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(recomputed === declared)
    // a lost row flips BOTH the count and the digest of its shard
    val tampered = Export
      .manifestOf(data.drop("shard").filter(col("doc_id") =!= 0L),
        "doc_id", 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val shard0 = declared.keySet.find(s =>
      tampered(s) != declared(s)).get
    assert(tampered(shard0)._1 === declared(shard0)._1 - 1)
    assert(tampered(shard0)._2 !== declared(shard0)._2)
    // consumer-side verifier: clean export -> no mismatches
    assert(Export.verifyManifest(spark, s"$dir/m", "doc_id") === Seq())
    // NEGATIVE path: delete one shard directory; the verifier must name
    // exactly that shard (declared side unmatched in the full-outer join)
    val victim = new java.io.File(s"$dir/m").listFiles()
      .filter(_.getName.startsWith("shard=")).head
    val victimId = victim.getName.stripPrefix("shard=").toInt
    victim.listFiles().foreach(_.delete()); victim.delete()
    assert(Export.verifyManifest(spark, s"$dir/m", "doc_id")
      === Seq(victimId))
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
