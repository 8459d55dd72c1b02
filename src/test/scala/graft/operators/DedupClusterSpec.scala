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

  test("distributed propagation converges over many rounds (long chain)") {
    val s = spark
    import s.implicits._
    // a 60-node chain needs O(log or diameter) label-propagation rounds —
    // exercises the per-round explicit repartitioning + convergence check
    // through MANY iterations, plus a disjoint triangle as a control
    val chain = (0L until 59L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((100L, 101L), (101L, 102L), (100L, 102L)))
      .toDF("a_id", "b_id")
    // neighbor-min + pointer jumping: the 60-node chain must converge in
    // O(log diameter) rounds, comfortably inside the 50-round default
    // (plain 1-hop propagation would need ~59)
    val got = Dedup.connectedComponents(pairs, "a_id", "b_id",
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 59L).forall(got(_) == 0L), "chain must collapse to min id")
    assert(Seq(100L, 101L, 102L).forall(got(_) == 100L))
    assert(got.size === 63)
  }

  test("SimHash recall: block-rotation is pigeonhole-exact; the high-16 " +
      "bucket heuristic's recall is measured") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val maxH = 3
    // exact baseline: every pair within maxHamming, no bucketing
    val sigs = Dedup.simhashes(docs, "doc_id", "text")
    val exact = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", graft.functions.DedupFunctions.hamming64(
        col("a.simhash"), col("b.simhash")))
      .filter(col("hamming") <= maxH)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .persist()
    val nExact = exact.count()
    assert(nExact > 0, "baseline found no near-dup pairs to measure against")

    // nTables = maxHamming + 1 > differing bits: some block must match,
    // so recall is EXACTLY 1 (and no false pairs survive the Hamming
    // verify — the result equals the baseline, not just covers it)
    val blocked = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxHamming = maxH, nTables = maxH + 1)
    assert(Similarity.recall(blocked, exact, Seq("a_id", "b_id")) === 1.0)
    assert(blocked.count() === nExact)

    // the single high-16-bucket heuristic: cheaper (one bucket per doc),
    // recall < 1 by construction — measured here so the trade-off is a
    // number, not a guess (~0.55 on this corpus at maxHamming=3)
    val bucketed = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxHamming = maxH)
    val r = Similarity.recall(bucketed, exact, Seq("a_id", "b_id"))
    info(f"high-16 bucket recall at hamming<=$maxH: $r%.3f " +
      f"($nExact exact pairs)")
    assert(r >= 0.3, s"bucket-heuristic recall $r fell under 0.3")
    exact.unpersist()
  }

  test("incrementalDedup flags copies against the index without " +
      "touching existing text") {
    val s = spark
    import s.implicits._
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "a completely different document about spark query planning")
    ).toDF("doc_id", "text")
    val index = Dedup.buildDedupIndex(existing, "doc_id", "text")
    // the index carries ONLY ids + signatures + band keys — no text; the
    // signature is stored ONCE per doc (normalized out of the band rows)
    index.signatures.persist(); index.bands.persist()
    assert(index.signatures.columns.toSeq === Seq("index_id", "sig"))
    assert(index.bands.columns.toSeq === Seq("band", "key", "index_id"))
    assert(index.signatures.count() === existing.count())

    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog every day"), // copy of 1
      (11L, "entirely novel content that matches nothing in the corpus here")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(incoming, "doc_id", "text", index,
        threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_dup"), Option(r.getAs[Any]("matched_id"))))
      .toMap
    assert(out(10L) === ((true, Some(1L))))
    assert(out(11L) === ((false, None)))
    index.signatures.unpersist(); index.bands.unpersist()
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

  test("electCanonicalByScore keeps the best-scoring member per " +
      "cluster, ties on smallest id, singletons stay canonical") {
    val s = spark
    import s.implicits._
    val clustered = Seq(
      // cluster 1: doc 3 has the top score
      (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 50L),
      // cluster 10: score tie between 10 and 11 -> smallest id wins
      (10L, 10L, 25L), (11L, 10L, 25L),
      // singleton
      (20L, 20L, 5L)
    ).toDF("doc_id", "component", "score")
    val out = Dedup.electCanonicalByScore(clustered, "doc_id",
        "component", "score")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(3))
      .toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> true,
      10L -> true, 11L -> false, 20L -> true))
    // exactly one canonical per cluster, regardless of scores
    val counts = Dedup.electCanonicalByScore(clustered, "doc_id",
        "component", "score")
      .groupBy("component")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(counts.forall(_ === 1L))
  }

  test("softDedupWeights: each cluster's weights sum to one; " +
      "singletons keep full weight; total effective mass = number of " +
      "distinct clusters") {
    val s = spark
    import s.implicits._
    val clustered = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // size 3
      (10L, 10L), (11L, 10L),       // size 2
      (20L, 20L)                    // singleton
    ).toDF("doc_id", "component")
    val w = Dedup.softDedupWeights(clustered, "component")
    val byDoc = w.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("cluster_size"), r.getAs[Double]("soft_weight")))
      .toMap
    assert(byDoc(1L) === (3L, 1.0 / 3))
    assert(byDoc(10L) === (2L, 0.5))
    assert(byDoc(20L) === (1L, 1.0))
    val perCluster = w.groupBy("component")
      .agg(sum(col("soft_weight")).as("sw"))
      .collect().map(_.getAs[Double]("sw"))
    assert(perCluster.forall(x => math.abs(x - 1.0) < 1e-12))
    val total = w.agg(sum(col("soft_weight"))).head().getDouble(0)
    assert(math.abs(total - 3.0) < 1e-12) // 3 distinct clusters
  }

  test("crossSplitLeakage: cross pairs counted once, contaminated = " +
      "distinct test docs with a train twin, clean split reads zero") {
    val s = spark
    import s.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val t2 = "one two three four five six seven eight nine ten " +
      "eleven twelve"
    val docs = Seq(
      (1L, t1), (2L, t1),   // dup cluster A
      (3L, t2), (4L, t2),   // dup cluster B
      (5L, "entirely unrelated text with its own words here today")
    ).toDF("doc_id", "text")
    // 2 and 5 in test: pair (1,2) crosses, (3,4) stays train-side
    val r = Dedup.crossSplitLeakage(docs, "doc_id", "text",
      inTest = col("doc_id").isin(2L, 5L)).head()
    assert(r.getAs[Long]("n_dup_pairs") === 2L)
    assert(r.getAs[Long]("n_cross_pairs") === 1L)
    assert(r.getAs[Long]("n_test") === 2L)
    assert(r.getAs[Long]("n_contaminated") === 1L)
    assert(r.getAs[Double]("contamination_rate") === 0.5)
    // splitting BY CLUSTER zeroes the audit
    val clean = Dedup.crossSplitLeakage(docs, "doc_id", "text",
      inTest = col("doc_id").isin(3L, 4L)).head()
    assert(clean.getAs[Long]("n_cross_pairs") === 0L)
    assert(clean.getAs[Long]("n_contaminated") === 0L)
  }
}
