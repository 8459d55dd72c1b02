package graft.operators

import java.nio.file.Files

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index: round-trip fidelity of the centroid sidecar,
  * exactness at full probe, recall growth with nProbe, and the
  * partitionBy(list_id) layout actually pruning files.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val vectors =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val queryVec: Seq[Double] =
    vectors.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect().head.getSeq[Double](0).toSeq

  test("sidecar centroids round-trip bit-identically") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val dir = Files.createTempDirectory("graft-ivf1").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dir, cents)
    val back = Similarity.readIvfCentroids(spark, dir)
    assert(back === cents)
  }

  test("ivfListProfile: every indexed row appears with its own-list " +
      "distance; a drifted append sits farther than the base build " +
      "(the retrain signal)") {
    val base = vectors.filter(col("vec_id") % 2 === 0)
    val drifted = vectors.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        expr("transform(embedding, (v, i) -> v + CASE WHEN i = 0 " +
          "THEN CAST(1.5 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)")
          .as("embedding"))
    val cents = Clustering.kmeansCentroids(base, "vec_id",
      "embedding", k = 4, iters = 2)
    val dir = Files.createTempDirectory("graft-ivf-drift").toString
    Similarity.writeIvfIndex(base, "vec_id", "embedding", dir, cents)
    Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", dir)
    val prof = Similarity.ivfListProfile(spark, dir)
      .collect()
    assert(prof.length.toLong === vectors.count())
    // distance matches a hand recomputation for one row
    val r0 = prof.filter(_.getLong(0) == 0L).head
    val v0 = queryVec
    val c0 = cents(r0.getInt(1))
    val hand = v0.zip(c0).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(math.abs(r0.getDouble(2) - hand) < 1e-12)
    // the drift is visible: appended mean own-list distance strictly
    // above the base mean
    val (b, a) = prof.partition(_.getLong(0) % 2 == 0)
    val mb = b.map(_.getDouble(2)).sum / b.length
    val ma = a.map(_.getDouble(2)).sum / a.length
    assert(ma > mb, s"drifted append must sit farther: $ma vs $mb")
  }

  test("bitextProbeIndexed: forward-margin best match against the " +
      "persisted lists equals the in-memory computation on the same " +
      "split, and each probe appears at most once") {
    val idx = vectors.filter(col("vec_id") % 3 =!= 0)
    val delta = vectors.filter(col("vec_id") % 3 === 0)
    val cents = Clustering.kmeansCentroids(idx, "vec_id", "embedding",
      k = 4, iters = 2)
    val dir = Files.createTempDirectory("graft-ivf-bitext").toString
    Similarity.writeIvfIndex(idx, "vec_id", "embedding", dir, cents)
    val out = Similarity.bitextProbeIndexed(spark, dir, delta,
      "vec_id", "embedding", k = 4, nAssign = 2).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    assert(out.nonEmpty)
    // every best_match comes from the INDEXED side
    assert(out.forall(_.getLong(1) % 3 != 0))
    // the margin column is snapped and ≥ its own definition's floor:
    // best margin = cos/avgK(x) where cos is IN the top-k average, so
    // any probe with a full candidate set has margin > 0
    assert(out.forall(r => !r.isNullAt(3)))
  }

  test("full probe is exact; recall grows with nProbe on a trained index") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val dir = Files.createTempDirectory("graft-ivf2").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dir, cents)

    val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
      vectors.filter(col("vec_id") === 0).select(col("embedding").as("q_emb")),
      k = 10)
    def recallAt(nProbe: Int): Double = Similarity.recall(
      Similarity.ivfTopKIndexed(spark, dir, queryVec, k = 10, nProbe)
        .withColumnRenamed("id", "vec_id"),
      exact, Seq("vec_id"))

    // probing every list degenerates to the exact scan
    assert(recallAt(8) === 1.0)
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    assert(r4 >= r1, s"recall fell with more probes: $r1 -> $r4")
    info(f"trained-IVF recall@10: nProbe=1 $r1%.2f, nProbe=4 $r4%.2f")
  }

  test("trained centroids vs hash planes: measured recall at equal " +
      "probe budget through the same index API") {
    val trained = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val untrained = graft.functions.VectorFunctions
      .deterministicPlanes(8, 64)
    val dirT = Files.createTempDirectory("graft-ivf-t").toString
    val dirU = Files.createTempDirectory("graft-ivf-u").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dirT, trained)
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dirU, untrained)

    def avgRecall(dir: String): Double = {
      val qs = (0L until 20L)
      val rs = qs.map { qid =>
        val qv = vectors.filter(col("vec_id") === qid)
          .select(transform(col("embedding"), x => x.cast("double")))
          .collect().head.getSeq[Double](0).toSeq
        val exact = Similarity.bruteForceTopK(vectors, "vec_id",
          "embedding",
          vectors.filter(col("vec_id") === qid)
            .select(col("embedding").as("q_emb")), k = 10)
        Similarity.recall(
          Similarity.ivfTopKIndexed(spark, dir, qv, k = 10, nProbe = 2)
            .withColumnRenamed("id", "vec_id"),
          exact, Seq("vec_id"))
      }
      rs.sum / rs.size
    }
    val rT = avgRecall(dirT)
    val rU = avgRecall(dirU)
    info(f"avg recall@10, nProbe=2/8: trained $rT%.2f vs hash-plane $rU%.2f")
    // weak floor only — 100 vectors is too small to assert superiority
    // without flakiness; the measured numbers are the deliverable
    assert(rT >= 0.3, f"trained index recall collapsed: $rT%.2f")
  }

  test("quantized index: recall@10 vs the float index >= 0.85 at equal " +
      "probes, full probe matches the quantized brute force, and the " +
      "probe still prunes") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val dirF = Files.createTempDirectory("graft-ivf-float").toString
    val dirQ = Files.createTempDirectory("graft-ivf-quant").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dirF, cents)
    Similarity.writeIvfIndexQuantized(vectors, "vec_id", "embedding",
      dirQ, cents)

    // recall of the quantized probe AGAINST THE FLOAT INDEX at the same
    // probe budget, averaged over 20 queries: int8 rounding is the only
    // difference (identical lists probed), so this isolates the
    // quantization loss — the q76 >= 0.85 precedent
    val rs = (0L until 20L).map { qid =>
      val qv = vectors.filter(col("vec_id") === qid)
        .select(transform(col("embedding"), x => x.cast("double")))
        .collect().head.getSeq[Double](0).toSeq
      Similarity.recall(
        Similarity.ivfTopKIndexedQuantized(spark, dirQ, qv, k = 10,
          nProbe = 2).select(col("id")),
        Similarity.ivfTopKIndexed(spark, dirF, qv, k = 10, nProbe = 2)
          .select(col("id")),
        Seq("id"))
    }
    val avg = rs.sum / rs.size
    info(f"quantized-vs-float IVF recall@10 at nProbe=2: $avg%.2f")
    assert(avg >= 0.85, f"quantization recall collapsed: $avg%.2f")

    // full probe == quantizedTopK over the whole table (the persisted
    // path adds layout, never different arithmetic)
    val full = Similarity.ivfTopKIndexedQuantized(spark, dirQ, queryVec,
        k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.quantizedTopK(vectors, "vec_id", "embedding",
        vectors.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb")), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === brute,
      s"full-probe quantized index diverged from brute force:\n" +
        s"$full\nvs\n$brute")

    // the quantized layout prunes exactly like the float one
    val probe = Similarity.ivfTopKIndexedQuantized(spark, dirQ, queryVec,
      k = 10, nProbe = 2)
    probe.collect()
    val allFiles = spark.read.parquet(s"$dirQ/lists").inputFiles.length
    val scanned = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(scanned.exists(_ < allFiles),
      s"quantized probe scanned $scanned of $allFiles files - no pruning")
  }

  test("probe reads prune on the list_id directory partitions") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val dir = Files.createTempDirectory("graft-ivf3").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dir, cents)

    val probe = Similarity.ivfTopKIndexed(spark, dir, queryVec,
      k = 10, nProbe = 2)
    val p = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(p).isDefined,
      "list_id reached the data-filter side - partitioning did not " +
        "apply:\n" + p)
    probe.collect()
    val lists = spark.read.parquet(s"$dir/lists")
    val allFiles = lists.inputFiles.length
    val scanned = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(scanned.exists(_ < allFiles),
      s"probe scanned $scanned of $allFiles files - no pruning")
  }

  test("appendToIvfIndex folds vectors in (float AND quantized); " +
      "compactIvfIndex restores one file per list with identical rows") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val half1 = vectors.filter(col("vec_id") < 50)
    val half2 = vectors.filter(col("vec_id") >= 50)

    def listRows(path: String) =
      spark.read.parquet(s"$path/lists").select("id", "list_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    // float family: fold == one-shot write, row-for-row
    val dirF = Files.createTempDirectory("graft-ivf-fold-f").toString
    val dirFull = Files.createTempDirectory("graft-ivf-fold-full").toString
    Similarity.writeIvfIndex(half1, "vec_id", "embedding", dirF, cents)
    Similarity.appendToIvfIndex(half2, "vec_id", "embedding", dirF)
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dirFull, cents)
    assert(listRows(dirF) ===
      listRows(dirFull))
    // and a query through the folded index == through the one-shot one
    def top(path: String) = Similarity
      .ivfTopKIndexed(spark, path, queryVec, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(dirF) === top(dirFull))

    // quantized family: the sidecar flag routes the append to int8 rows
    val dirQ = Files.createTempDirectory("graft-ivf-fold-q").toString
    Similarity.writeIvfIndexQuantized(half1, "vec_id", "embedding", dirQ,
      cents)
    Similarity.appendToIvfIndex(half2, "vec_id", "embedding", dirQ)
    val dirQFull = Files.createTempDirectory("graft-ivf-fold-qf").toString
    Similarity.writeIvfIndexQuantized(vectors, "vec_id", "embedding",
      dirQFull, cents)
    def qTop(path: String) = Similarity
      .ivfTopKIndexedQuantized(spark, path, queryVec, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(qTop(dirQ) === qTop(dirQFull))

    // compaction: the folded index has appended files; the compacted
    // rewrite has exactly one per list dir, same rows, same sidecar
    val perDirBefore = spark.read.parquet(s"$dirF/lists").inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDirBefore.exists(_._2.length > 1),
      "fixture never produced a multi-file leaf - fold test too weak")
    intercept[IllegalArgumentException] {
      Similarity.compactIvfIndex(spark, dirF, dirF) // in-place refused
    }
    val dirC = Files.createTempDirectory("graft-ivf-compact").toString
    Similarity.compactIvfIndex(spark, dirF, dirC)
    val perDirAfter = spark.read.parquet(s"$dirC/lists").inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDirAfter.forall(_._2.length == 1),
      s"compaction left multi-file leaves: $perDirAfter")
    assert(listRows(dirC) ===
      listRows(dirFull))
    assert(Similarity.readIvfCentroids(spark, dirC) === cents)
    assert(top(dirC) === top(dirFull))
  }

  test("a mismatched path fails fast instead of probing wrong lists") {
    val dir = Files.createTempDirectory("graft-ivf4").toString
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKIndexed(spark, dir, queryVec, k = 10, nProbe = 1)
    }
    assert(e.getMessage.contains("not a graft IVF index"))
  }

  test("persisted IVF-PQ index: sidecar model round-trips bit-" +
      "identically, indexed query == in-memory query, probes prune " +
      "files, wrong path fails fast") {
    val model = Similarity.trainPq(vectors, "vec_id", "embedding",
      m = 16, k = 16, iters = 2)
    val dir = Files.createTempDirectory("graft-ivfpq").toString
    Similarity.writeIvfPqIndex(vectors, "vec_id", "embedding", dir,
      model, nLists = 16)
    val (back, nLists, dim) = Similarity.readIvfPqMeta(spark, dir)
    assert(back === model && nLists === 16 && dim === 64)

    val mem = Similarity.ivfPqTopK(
        Similarity.pqEncode(
          Similarity.assignLists(vectors, "embedding", nLists = 16),
          "vec_id", "embedding", model),
        "vec_id", queryVec, model, k = 10, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = Similarity.ivfPqTopKIndexed(spark, dir, queryVec,
        k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(idx === mem,
      s"disk round-trip changed the answer: $idx vs $mem")

    val probe = Similarity.ivfPqTopKIndexed(spark, dir, queryVec,
      k = 10, nProbe = 2)
    probe.collect()
    val allFiles = spark.read.parquet(s"$dir/lists").inputFiles.length
    val scanned = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(scanned.exists(_ < allFiles),
      s"probe scanned $scanned of $allFiles files - no pruning")

    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark,
        Files.createTempDirectory("graft-ivfpq-bad").toString,
        queryVec, k = 10, nProbe = 1)
    }
    assert(e.getMessage.contains("not a graft IVF-PQ index"))
  }

  test("ivfMaintenancePlan: n_files matches the real on-disk layout " +
      "(one file per touched list per write), the action follows the " +
      "drift-ratio and file-count rules, and compaction returns " +
      "appended lists to ok") {
    val s = spark
    import org.apache.spark.sql.functions._
    val base = vectors.filter(col("vec_id") % 2 === 0)
    val drifted = vectors.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        expr("transform(embedding, (v, i) -> v + CASE WHEN i = 0 " +
          "THEN CAST(2.0 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)")
          .as("embedding"))
    val cents = Clustering.kmeansCentroids(base, "vec_id", "embedding",
      k = 4, iters = 1)
    val dir = Files.createTempDirectory("graft-ivf-maint").toString
    Similarity.writeIvfIndex(base, "vec_id", "embedding", dir, cents)
    Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", dir)
    def audit(path: String) = Similarity.ivfListProfile(s, path)
      .withColumn("__nano", floor(col("dist") * 1e6 + lit(0.5))
        .cast("long"))
      .withColumn("__app", (col("id") % 2 === 1).cast("int"))
      .groupBy(col("list_id"))
      .agg(sum(lit(1) - col("__app")).cast("long").as("n_base"),
        sum(col("__app")).cast("long").as("n_appended"),
        sum(when(col("__app") === 0, col("__nano"))).as("__sb"),
        sum(when(col("__app") === 1, col("__nano"))).as("__sa"))
      .select(col("list_id"), col("n_base"), col("n_appended"),
        (col("__sb").cast("double") /
          (lit(1e6) * col("n_base").cast("double")))
          .as("mean_dist_base"),
        (col("__sa").cast("double") /
          (lit(1e6) * col("n_appended").cast("double")))
          .as("mean_dist_appended"))
    val plan = Similarity.ivfMaintenancePlan(s, dir, audit(dir),
      retrainRatio = 1.5, maxFilesPerList = 1).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val nb = r.getAs[Long]("n_base"); val na = r.getAs[Long]("n_appended")
      // file arithmetic: one file per touched list per write batch
      val expectFiles = (if (nb > 0) 1L else 0L) + (if (na > 0) 1L else 0L)
      assert(r.getAs[Long]("n_files") === expectFiles, r.toString)
      // the action follows the row's own columns
      val drift = na > 0 && nb > 0 &&
        r.getAs[Double]("mean_dist_appended") >
          1.5 * r.getAs[Double]("mean_dist_base")
      val expect = if (drift) "retrain"
        else if (expectFiles > 1) "compact" else "ok"
      assert(r.getAs[String]("action") === expect, r.toString)
    }
    // the +2.0 dim-0 plant is strong: at least one list must alarm
    assert(plan.exists(_.getAs[String]("action") == "retrain"),
      plan.mkString("; "))
    // an impossible ratio disables retrain -> appended lists compact
    val noDrift = Similarity.ivfMaintenancePlan(s, dir, audit(dir),
      retrainRatio = 1e9, maxFilesPerList = 1).collect()
    assert(noDrift.forall(_.getAs[String]("action") != "retrain"))
    assert(noDrift.filter(_.getAs[Long]("n_appended") > 0)
      .forall(_.getAs[String]("action") == "compact"))
    // compaction restores one file per list -> nothing compacts
    val dest = Files.createTempDirectory("graft-ivf-maint-c").toString
    Similarity.compactIvfIndex(s, dir, dest)
    val after = Similarity.ivfMaintenancePlan(s, dest, audit(dest),
      retrainRatio = 1e9, maxFilesPerList = 1).collect()
    assert(after.forall(_.getAs[Long]("n_files") === 1L))
    assert(after.forall(_.getAs[String]("action") == "ok"))
  }

  test("retrainIvfIndex clears the drift alarm: after re-training on " +
      "the index contents, the appended population's distance ratio " +
      "no longer exceeds the retrain threshold anywhere") {
    val s = spark
    import org.apache.spark.sql.functions._
    val base = vectors.filter(col("vec_id") % 2 === 0)
    val drifted = vectors.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        expr("transform(embedding, (v, i) -> v + CASE WHEN i = 0 " +
          "THEN CAST(2.0 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)")
          .as("embedding"))
    val cents = Clustering.kmeansCentroids(base, "vec_id", "embedding",
      k = 4, iters = 1)
    val dir = Files.createTempDirectory("graft-ivf-rt-src").toString
    val dest = Files.createTempDirectory("graft-ivf-rt-dst").toString + "/ix"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", dir, cents)
    Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", dir)
    def alarms(path: String): Long = Similarity.ivfListProfile(s, path)
      .withColumn("__app", (col("id") % 2 === 1).cast("int"))
      .groupBy(col("list_id"))
      .agg(avg(when(col("__app") === 0, col("dist"))).as("mb"),
        avg(when(col("__app") === 1, col("dist"))).as("ma"))
      .filter(col("mb").isNotNull && col("ma").isNotNull &&
        col("ma") > col("mb") * 1.5)
      .count()
    // the +2.0 plant alarms pre-retrain ...
    assert(alarms(dir) > 0)
    Similarity.retrainIvfIndex(s, dir, dest, k = 4, iters = 2)
    // ... and clears post-retrain: centroids now FIT the appended
    // population (it is half the data), so no list's appended mean
    // sits 1.5x beyond its base mean
    assert(alarms(dest) === 0L)
    // the rewrite is one file per list (the compaction invariant)
    val plan = Similarity.ivfMaintenancePlan(s, dest,
      Similarity.ivfListProfile(s, dest)
        .groupBy(col("list_id"))
        .agg(count(lit(1)).as("n_base"), lit(0L).as("n_appended"),
          avg(col("dist")).as("mean_dist_base"),
          lit(null).cast("double").as("mean_dist_appended")),
      retrainRatio = 1.5, maxFilesPerList = 1).collect()
    assert(plan.forall(_.getAs[Long]("n_files") === 1L))
    assert(plan.forall(_.getAs[String]("action") == "ok"))
    // sidecar k matches the retrain request
    assert(Similarity.readIvfCentroids(s, dest).size === 4)
  }
}
