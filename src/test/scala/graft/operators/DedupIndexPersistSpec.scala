package graft.operators

import java.nio.file.Files

import graft.ingest.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted form of the dedup index: round-trip fidelity, the
  * incremental path running unchanged against a re-read index, and the
  * partition layout actually pruning — the Scaladoc's 100 TB claim
  * ("partitionBy(band) + bucket by key so delta joins prune files"),
  * made real and asserted.
  */
class DedupIndexPersistSpec extends SparkSpec {

  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 40L).map { i =>
      val text =
        if (i % 10 == 3) "the quick brown fox jumps over the lazy dog " +
          s"variant $i"
        else s"document $i entirely distinct content stream alpha beta " +
          s"gamma ${i * 7} delta ${i * 13} epsilon"
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def delta: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (100L, "the quick brown fox jumps over the lazy dog variant 3"),
      (101L, "completely fresh never seen before text about volcanoes " +
        "and glaciers")
    ).toDF("doc_id", "text")
  }

  test("writeIndex/readIndex round-trips both sides exactly") {
    val idx = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    val dir = Files.createTempDirectory("graft-dedup-idx").toString
    Dedup.writeIndex(idx, dir, keyBuckets = 8, idShards = 4)
    val back = Dedup.readIndex(spark, dir)

    def bandSet(df: DataFrame) = df.select("band", "key", "index_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(bandSet(back.bands) === bandSet(idx.bands))

    def sigSet(df: DataFrame) = df.select("index_id", "sig")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toSet
    assert(sigSet(back.signatures) === sigSet(idx.signatures))

    // the layout columns round-trip consistently with their derivations
    val badBuckets = back.bands
      .filter(Dedup.keyBucketOf(col("key"), 8) =!= col("key_bucket"))
      .count()
    assert(badBuckets === 0L, "key_bucket must be splitmix64(key) mod 8")

    // the layout sidecar rides with the index and is the delta side's
    // source of truth for the bucket modulus
    val meta = Dedup.readIndexMeta(spark, dir)
    assert(meta === Dedup.DedupIndexMeta(keyBuckets = 8, idShards = 4))
    val deltaBucketMismatch = back.bands
      .filter(Dedup.deltaKeyBucket(spark, dir, col("key")) =!= col("key_bucket"))
      .count()
    assert(deltaBucketMismatch === 0L,
      "deltaKeyBucket(path, key) must reproduce the on-disk layout")
  }

  test("readIndex refuses a directory without the layout sidecar") {
    val idx = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    val dir = Files.createTempDirectory("graft-dedup-idx-nometa").toString
    Dedup.writeIndex(idx, dir, keyBuckets = 8, idShards = 4)
    Files.delete(java.nio.file.Paths.get(s"$dir/_graft_index.json"))
    val e = intercept[IllegalArgumentException] {
      Dedup.readIndex(spark, dir)
    }
    assert(e.getMessage.contains("_graft_index.json"))
  }

  test("rows are sorted by key within each written band file") {
    val idx = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    val dir = Files.createTempDirectory("graft-dedup-idx-order").toString
    Dedup.writeIndex(idx, dir, keyBuckets = 8, idShards = 4)
    // every leaf file individually: the dynamic-partition writer inserts
    // its own sort on the partition columns when the child ordering
    // doesn't already satisfy them — writeIndex's sort leads with (band,
    // key_bucket) exactly so the trailing `key` order SURVIVES that
    // requirement. Read each file alone (no merge) and assert the order.
    val files = spark.read.parquet(s"$dir/bands").inputFiles
    assert(files.length > 8, s"fixture too small (${files.length} files)")
    files.foreach { f =>
      val keys = spark.read.parquet(f).select("key")
        .collect().map(_.getLong(0)).toSeq
      assert(keys === keys.sorted, s"keys out of order in $f")
    }
  }

  test("incrementalDedup against the re-read index matches in-memory") {
    val idx = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    val dir = Files.createTempDirectory("graft-dedup-idx2").toString
    Dedup.writeIndex(idx, dir, keyBuckets = 8, idShards = 4)
    val back = Dedup.readIndex(spark, dir)

    def run(i: Dedup.DedupIndex) =
      Dedup.incrementalDedup(delta, "doc_id", "text", i, threshold = 0.7)
        .select("doc_id", "is_dup", "matched_id")
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .sortBy(_._1)
        .toSeq
    val mem = run(idx)
    val disk = run(back)
    assert(disk === mem)
    // and the fixture actually exercises both outcomes
    assert(mem.find(_._1 == 100L).exists(_._2), "near-dup must be flagged")
    assert(mem.find(_._1 == 101L).exists(!_._2), "fresh doc must pass")
    // the disk-backed join must carry the LAYOUT column as a join key
    // (key_bucket is functionally dependent on key via the sidecar
    // modulus) — that extra equi-key on the partition column is what
    // lets DPP prune the bands scan to the delta's buckets
    val diskPlan = Dedup.incrementalDedup(delta, "doc_id", "text", back,
      threshold = 0.7).queryExecution.optimizedPlan.toString
    assert(diskPlan.contains("key_bucket"),
      "disk-backed incremental join lost the layout column:\n" + diskPlan)
    val memPlan = Dedup.incrementalDedup(delta, "doc_id", "text", idx,
      threshold = 0.7).queryExecution.optimizedPlan.toString
    assert(!memPlan.contains("key_bucket"),
      "in-memory index has no layout - key_bucket must not appear")
  }

  test("appendToIndex folds a delta index: rows == rebuild on the union, " +
      "and incrementalDedup flags against the folded content") {
    val s = spark
    import s.implicits._
    val dNew = Seq(
      (50L, "the new canonical sentence about volcanoes glaciers and " +
        "time passing slowly")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-dedup-idx-fold").toString
    Dedup.writeIndex(Dedup.buildDedupIndex(corpus, "doc_id", "text"), dir,
      keyBuckets = 8, idShards = 4)
    val probe = Seq(
      (200L, "the new canonical sentence about volcanoes glaciers and " +
        "time passing slowly indeed")
    ).toDF("doc_id", "text")
    def run(i: Dedup.DedupIndex) =
      Dedup.incrementalDedup(probe, "doc_id", "text", i, threshold = 0.7)
        .select("doc_id", "is_dup", "matched_id")
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    assert(run(Dedup.readIndex(spark, dir)).forall(!_._2),
      "probe must be fresh before the fold")

    // fold the delta in: same signature params as the base build (the
    // appendToIndex caller contract, as for incrementalDedup)
    Dedup.appendToIndex(Dedup.buildDedupIndex(dNew, "doc_id", "text"), dir)

    val folded = Dedup.readIndex(spark, dir)
    val rebuilt = Dedup.buildDedupIndex(corpus.unionByName(dNew),
      "doc_id", "text")
    def bandSet(df: DataFrame) = df.select("band", "key", "index_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    def sigSet(df: DataFrame) = df.select("index_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toSet
    assert(bandSet(folded.bands) === bandSet(rebuilt.bands),
      "folded band rows must equal the union rebuild")
    assert(sigSet(folded.signatures) === sigSet(rebuilt.signatures),
      "folded signature rows must equal the union rebuild")
    // and the folded layout column still derives from the sidecar modulus
    assert(folded.bands
      .filter(Dedup.keyBucketOf(col("key"), 8) =!= col("key_bucket"))
      .count() === 0L)

    val after = run(folded)
    assert(after === Seq((200L, true, Some(50L))),
      s"probe must flag against the folded doc 50: $after")

    // compaction restores one file per leaf with the same rows, same
    // layout moduli, same incremental verdicts
    val bandFiles = spark.read.parquet(s"$dir/bands").inputFiles
    assert(bandFiles.groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .exists(_._2.length > 1),
      "fold never produced a multi-file leaf - compaction test too weak")
    // in-place compaction would lazily read the source while
    // overwriting it — the guard must refuse before any I/O
    intercept[IllegalArgumentException] {
      Dedup.compactIndex(spark, dir, dir)
    }
    val dirC = Files.createTempDirectory("graft-dedup-idx-compact").toString
    Dedup.compactIndex(spark, dir, dirC)
    val cBands = spark.read.parquet(s"$dirC/bands").inputFiles
    assert(cBands.groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .forall(_._2.length == 1), "compaction left multi-file leaves")
    val compacted = Dedup.readIndex(spark, dirC)
    assert(bandSet(compacted.bands) === bandSet(rebuilt.bands))
    assert(sigSet(compacted.signatures) === sigSet(rebuilt.signatures))
    assert(Dedup.readIndexMeta(spark, dirC) ===
      Dedup.readIndexMeta(spark, dir))
    assert(run(compacted) === after)
  }

  test("bands reads prune on the (band, key_bucket) directory partitions") {
    val idx = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    val dir = Files.createTempDirectory("graft-dedup-idx3").toString
    Dedup.writeIndex(idx, dir, keyBuckets = 8, idShards = 4)

    val bands = spark.read.parquet(s"$dir/bands")
    val probe = bands.filter(col("band") === 0 && col("key_bucket") === 3)
    val p = probe.queryExecution.executedPlan.toString
    // both layout columns are PARTITION filters (pruned at file listing),
    // not data filters evaluated per row after a full scan
    assert(p.contains("PartitionFilters: ["), p)
    assert("PartitionFilters: \\[[^\\]]*band".r.findFirstIn(p).isDefined, p)
    assert("PartitionFilters: \\[[^\\]]*key_bucket".r.findFirstIn(p).isDefined,
      p)
    assert(!p.contains("PushedFilters: [IsNotNull(band"),
      "band reached the data-filter side - partitioning did not apply:\n" + p)

    // behavioral check: the probe's scan READS strictly fewer files than
    // the index holds (each leaf dir is one file, so pruning shows up
    // directly in the scan's numFiles metric)
    val allFiles = bands.inputFiles.length
    assert(allFiles > 8,
      s"fixture too small to demonstrate pruning ($allFiles files)")
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in probe plan:\n" + p))
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles < allFiles,
      s"scan read $readFiles of $allFiles files - no pruning happened")
  }
}
