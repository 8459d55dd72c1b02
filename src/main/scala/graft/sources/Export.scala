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

  /** One manifest row per shard: (shard, n_rows, content_hash), where
    * content_hash is an ORDER-INDEPENDENT digest of the shard's rows:
    * `bit_xor` of per-row `xxhash64(id)` — commutative (task/file
    * ordering inside a shard cannot change it) and overflow-free under
    * ANSI, unlike a wrapping sum. XOR cancels DUPLICATE ids; ids are the
    * shard-membership identity and unique by contract, so a cancelled
    * pair would itself be a corruption worth failing on.
    */
  def manifestOf(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("__mh", xxhash64(col(idCol)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__mh)").as("content_hash"))

  /** Write the sharded export AND its manifest (`path.manifest`): a
    * consumer first reads the manifest, then verifies each shard's row
    * count/digest before trusting a resumed or concurrent export — the
    * cheap end-to-end completeness check a training job runs at startup.
    * The manifest is written AFTER the data (ordering is the atomicity
    * seam on an object store: manifest-present implies data-complete).
    */
  def shardedParquetWithManifest(df: DataFrame, idCol: String,
      path: String, nShards: Int): Unit = {
    shardedParquet(df, idCol, path, nShards)
    manifestOf(df, idCol, nShards)
      .coalesce(1).write.mode("overwrite").parquet(path + ".manifest")
  }

  /** Consumer-side startup check: recompute every shard's (n_rows,
    * content_hash) from the DATA at `path` — grouped by the DIRECTORY
    * partition column, NOT recomputed from the id, so a row sitting in
    * the wrong `shard=N/` directory (partial re-export, copy bug) shows
    * up as a mismatch in both affected shards instead of verifying clean
    * — and compare to the declared manifest. Returns the mismatching
    * shard ids — empty means the export is complete, correctly placed,
    * and untampered. One scan; run it before the first training step.
    */
  def verifyManifest(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): Seq[Int] = {
    val declared = spark.read.parquet(path + ".manifest")
      .select(col("shard"), col("n_rows"), col("content_hash"))
    val actual = spark.read.parquet(path)
      .withColumn("__mh", xxhash64(col(idCol)))
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__mh)").as("content_hash"))
    declared.as("d")
      .join(actual.as("a"), col("d.shard") === col("a.shard"), "full_outer")
      .filter(col("d.shard").isNull || col("a.shard").isNull ||
        col("d.n_rows") =!= col("a.n_rows") ||
        col("d.content_hash") =!= col("a.content_hash"))
      .select(coalesce(col("d.shard"), col("a.shard")))
      .collect().map(_.getInt(0)).toSeq.sorted
  }
}
