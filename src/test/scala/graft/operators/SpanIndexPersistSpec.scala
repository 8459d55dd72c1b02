package graft.operators

import java.nio.file.Files

import graft.ingest.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted span inverted index: round-trip fidelity, sidecar
  * enforcement, the partition layout actually pruning, and the
  * incremental delta path agreeing with an in-memory full replay —
  * the mirror of DedupIndexPersistSpec for the span family.
  */
class SpanIndexPersistSpec extends SparkSpec {

  private val passage = "one two three four five six seven eight"

  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 40L).map { i =>
      val text =
        if (i % 10 == 3) s"prefix $i $passage suffix $i"
        else s"document $i entirely distinct content stream alpha beta " +
          s"gamma ${i * 7} delta ${i * 13} epsilon zeta eta theta"
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def delta: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (100L, s"fresh wrapper around $passage and some trailing words"),
      (101L, "completely fresh never seen before text about volcanoes " +
        "and glaciers erupting slowly")
    ).toDF("doc_id", "text")
  }

  test("writeSpanIndex/readSpanIndex round-trips rows, buckets derive " +
      "from the sidecar modulus") {
    val dir = Files.createTempDirectory("graft-span-idx").toString
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", dir,
      spanTokens = 5, hashBuckets = 8)
    val back = SpanDedup.readSpanIndex(spark, dir)
    // same distinct (id, h) set as an in-memory explode
    val mem = corpus
      .withColumn("__t", graft.functions.TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shinglesOf(col("__t"), 5))
          .as("span"))
      .select(col("doc_id"), SpanDedup.spanHash(col("span")).as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val disk = back.select("index_id", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(disk === mem)
    // layout column consistent with the sidecar-declared modulus
    val meta = SpanDedup.readSpanIndexMeta(spark, dir)
    assert(meta === SpanDedup.SpanIndexMeta(spanTokens = 5, hashBuckets = 8))
    val bad = back
      .filter(Dedup.keyBucketOf(col("h"), 8) =!= col("h_bucket")).count()
    assert(bad === 0L, "h_bucket must be splitmix64(h) mod 8")
  }

  test("readSpanIndex refuses a directory without the layout sidecar") {
    val dir = Files.createTempDirectory("graft-span-idx-nometa").toString
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", dir, spanTokens = 5)
    Files.delete(java.nio.file.Paths.get(
      s"$dir/${SpanDedup.SpanMetaFile}"))
    val e = intercept[IllegalArgumentException] {
      SpanDedup.readSpanIndex(spark, dir)
    }
    assert(e.getMessage.contains(SpanDedup.SpanMetaFile))
  }

  test("span reads prune on the h_bucket directory partitions") {
    val dir = Files.createTempDirectory("graft-span-idx-prune").toString
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", dir,
      spanTokens = 5, hashBuckets = 8)
    val spans = spark.read.parquet(s"$dir/spans")
    val probe = spans.filter(col("h_bucket") === 3)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p)
    assert("PartitionFilters: \\[[^\\]]*h_bucket".r.findFirstIn(p).isDefined,
      p)
    val allFiles = spans.inputFiles.length
    assert(allFiles > 4,
      s"fixture too small to demonstrate pruning ($allFiles files)")
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in probe plan:\n" + p))
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles < allFiles,
      s"scan read $readFiles of $allFiles files - no pruning happened")
  }

  test("incrementalSpanDedup flags delta docs repeating indexed spans " +
      "and matches a full in-memory replay") {
    val dir = Files.createTempDirectory("graft-span-idx-inc").toString
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", dir, spanTokens = 5)
    val out = SpanDedup
      .incrementalSpanDedup(delta, "doc_id", "text", dir)
      .select("doc_id", "n_dup_spans", "has_dup_span", "matched_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1).toSeq
    // in-memory replay: delta spans joined against corpus spans directly
    def spansOf(df: DataFrame) = df
      .withColumn("__t", graft.functions.TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shinglesOf(col("__t"), 5))
          .as("span"))
      .distinct()
    val expected = spansOf(delta).as("d")
      .join(spansOf(corpus).as("c"), Seq("span"))
      .groupBy(col("d.doc_id"))
      .agg(countDistinct(col("span")).as("n"),
        min(col("c.doc_id")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Some(r.getLong(2))))
      .toSeq
    // doc 100 carries the passage (4 five-token spans intact) shared by
    // the 4 corpus variant docs; doc 101 is fresh
    assert(out.filter(_._3).map(t => (t._1, t._2, t._4)) === expected)
    assert(out.find(_._1 == 100L).exists(_._3), "copied doc must be flagged")
    val fresh = out.find(_._1 == 101L).get
    assert(!fresh._3 && fresh._2 === 0L && fresh._4.isEmpty)
  }

  test("appendToSpanIndex folds a delta: rows == rebuild on the union, " +
      "pruning intact, and a later delta flags against the folded content") {
    val s = spark
    import s.implicits._
    val passage2 = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
    val d1 = Seq(
      (50L, s"novel section $passage2 closing words here today")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-span-idx-fold").toString
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", dir,
      spanTokens = 5, hashBuckets = 8)
    // BEFORE the fold: a copy of the delta passage is fresh
    val probe2 = Seq(
      (200L, s"verbatim copy of $passage2 with trailing words"),
      (201L, "untouched fresh text about entirely different matters " +
        "nothing shared at all")
    ).toDF("doc_id", "text")
    def flags(path: String) = SpanDedup
      .incrementalSpanDedup(probe2, "doc_id", "text", path)
      .select("doc_id", "n_dup_spans", "has_dup_span", "matched_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1).toSeq
    assert(flags(dir).forall(!_._3),
      "nothing may flag before the delta is folded in")

    SpanDedup.appendToSpanIndex(d1, "doc_id", "text", dir)

    // row-for-row ≡ an index built over the union corpus in one shot
    val dir2 = Files.createTempDirectory("graft-span-idx-fold2").toString
    SpanDedup.writeSpanIndex(corpus.unionByName(d1), "doc_id", "text",
      dir2, spanTokens = 5, hashBuckets = 8)
    def rows(path: String) = SpanDedup.readSpanIndex(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(dir) === rows(dir2),
      "folded index must equal the union rebuild row-for-row")

    // the later delta now flags against the FOLDED content, identically
    // on the folded and the rebuilt index
    val after = flags(dir)
    assert(after === flags(dir2))
    assert(after.find(_._1 == 200L).exists(f => f._3 && f._4 === Some(50L)),
      s"passage copy must match the folded doc 50: $after")
    assert(after.find(_._1 == 201L).exists(!_._3))

    // pruning is untouched: a bucket probe still reads a strict subset
    // of files (each leaf now holds base + append files; the DIRECTORY
    // partitioning is what prunes)
    val spans = spark.read.parquet(s"$dir/spans")
    val probe = spans.filter(col("h_bucket") === 3)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in probe plan"))
    assert(scan.metrics("numFiles").value < spans.inputFiles.length,
      "bucket probe stopped pruning after the fold")

    // compaction restores one file per leaf, rows and sidecar unchanged
    assert(spans.inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .exists(_._2.length > 1),
      "fold never produced a multi-file leaf - compaction test too weak")
    intercept[IllegalArgumentException] {
      SpanDedup.compactSpanIndex(spark, dir, dir) // in-place refused
    }
    val dirC = Files.createTempDirectory("graft-span-idx-compact").toString
    SpanDedup.compactSpanIndex(spark, dir, dirC)
    val cFiles = spark.read.parquet(s"$dirC/spans").inputFiles
    assert(cFiles.groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .forall(_._2.length == 1), "compaction left multi-file leaves")
    assert(rows(dirC) === rows(dir2))
    assert(SpanDedup.readSpanIndexMeta(spark, dirC) ===
      SpanDedup.readSpanIndexMeta(spark, dir))
    assert(flags(dirC) === after)
  }

  test("incrementalSpanDedup hub cap drops template spans present in " +
      "more than maxDf corpus docs") {
    val s = spark
    import s.implicits._
    val template = (0L until 30L)
      .map(i => (i, s"head $i $passage tail $i"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-span-idx-hub").toString
    SpanDedup.writeSpanIndex(template, "doc_id", "text", dir,
      spanTokens = 5)
    val probe = Seq((200L, s"wrapper $passage closing")).toDF("doc_id", "text")
    val capped = SpanDedup
      .incrementalSpanDedup(probe, "doc_id", "text", dir, maxDf = 10)
      .select("has_dup_span").collect().head.getBoolean(0)
    assert(!capped, "a 30-doc template span must be capped at maxDf=10")
    val uncapped = SpanDedup
      .incrementalSpanDedup(probe, "doc_id", "text", dir, maxDf = 50)
      .select("has_dup_span").collect().head.getBoolean(0)
    assert(uncapped)
  }
}
