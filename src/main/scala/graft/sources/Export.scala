package graft.sources

import graft.expressions.HashExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-export sinks: the write side of corpus preparation.
  *
  * Dataloaders want many similarly-sized shard files whose MEMBERSHIP is
  * stable — re-exporting after an upstream tweak must keep each document
  * in the same shard (resumable training, cache-friendly), which rules
  * out `repartition(n)`'s round-robin. Shard = pmod(splitmix64(id),
  * nShards): a pure function of the id, engine-independent like the rest
  * of the hash family.
  *
  * Layout: one `shard=N/` directory per shard (standard partitioned
  * layout, prunable on read); `maxRecordsPerFile` bounds individual file
  * sizes inside hot shards without changing membership.
  */
object Export {

  /** Stable shard id in [0, nShards) for an id column. */
  def shardOf(id: org.apache.spark.sql.Column, nShards: Int) =
    pmod(HashExpressions.splitmix64(id.cast("long")), lit(nShards.toLong))
      .cast("int")

  /** Write `df` as sharded JSONL under `path` (`shard=N/part-*.json`). */
  def shardedJsonl(df: DataFrame, idCol: String, path: String,
      nShards: Int, maxRecordsPerFile: Int = 0): Unit =
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .repartition(col("shard")) // one task per shard -> few, large files
      .write
      .partitionBy("shard")
      .option("maxRecordsPerFile",
        if (maxRecordsPerFile > 0) maxRecordsPerFile.toString else "0")
      .mode("overwrite")
      .json(path)

  /** Same layout in parquet for columnar consumers. */
  def shardedParquet(df: DataFrame, idCol: String, path: String,
      nShards: Int): Unit =
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
