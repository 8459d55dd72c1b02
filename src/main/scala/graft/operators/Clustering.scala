package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * pass behind SemDeDup-style semantic dedup, data-mixture discovery, and
  * trained IVF coarse quantizers (the upgrade from
  * [[Similarity.assignLists]]'s untrained hash centroids).
  *
  * Deterministic by construction: init is the `k` vectors with the
  * smallest ids (no RNG state — reruns and engines agree), assignment
  * ties break to the smaller cluster id, and updated centroids are
  * rounded to the 1e-6 grid before the next iteration so the handful of
  * ulps that unordered double summation can move never feed back into
  * later assignments (the same cross-engine determinism device as the
  * q69 rounded-grid ranking).
  *
  * 100 TB shape: each iteration is one map-only assignment pass
  * (centroids travel as a k×dim literal — broadcast-sized by definition)
  * plus one partial-agg shuffle for the update (posexplode → (cluster,
  * pos) partial sums combine map-side; the shuffle carries k·dim rows per
  * partition, not the corpus). The only driver-side fact is the k×dim
  * centroid matrix itself — same bounded-fact rule as the stratum counts
  * in [[Sampling]].
  */
object Clustering {

  /** `iters` Lloyd updates from the deterministic init; returns the final
    * centroid matrix (k rows, each `dim` doubles on the 1e-6 grid).
    * Clusters that go empty keep their previous centroid.
    */
  def kmeansCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[Seq[Double]] = {
    require(k >= 1 && iters >= 0, "k and iters must be positive")
    var cents: Seq[Seq[Double]] = vectors
      .orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    // the assignment pass is the k·dim-per-row hot loop: a NARROW
    // input (one small parquet file → one partition) would run it on
    // a single core, so widen to the session parallelism when the
    // source arrives narrower — a no-op at corpus scale, where scans
    // come in far more partitions than cores (measured 3.1 → 0.9 s
    // for k=64, iters=2 on a 1-partition 2k×64 table at local[32]).
    // Scope-cache across iterations so each Lloyd round re-reads the
    // repartitioned rows, not the source scan. Determinism is
    // unaffected: the update is an unordered per-(cluster, pos) mean
    // already snapped to the 1e-6 grid by contract.
    val par = vectors.sparkSession.sparkContext.defaultParallelism
    val wide = if (vectors.rdd.getNumPartitions < par)
      vectors.repartition(par) else vectors
    val src = if (iters > 1) graft.CacheScope.register(wide.persist())
      else wide
    for (_ <- 0 until iters) {
      val updated = assign(src, idCol, vecCol, cents)
        .select(col("cluster"),
          posexplode(transform(col(vecCol), x => x.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("x")), 6).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.indices.map(c => updated.getOrElse(c, cents(c)))
    }
    cents
  }

  /** Every row of `vectors` plus `cluster` (nearest centroid, ties to the
    * smaller id) and `dist_sq` (squared L2 to it). Map-only: the centroid
    * matrix is a literal, distances run as one codegen'd fold per
    * centroid.
    */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    val best = nearest(col(vecCol), centroids)
    vectors
      .withColumn("__km", best)
      .withColumn("cluster", col("__km.cid"))
      .withColumn("dist_sq", col("__km.dist"))
      .drop("__km")
  }

  /** struct(dist, cid) of the nearest centroid: ascending array_sort on
    * (dist, cid) structs — the min-distance pick with the smaller-id tie
    * break, the exact mirror of `Similarity.bestLists`'s argmax.
    */
  private def nearest(v: Column, centroids: Seq[Seq[Double]]): Column =
    array_sort(scoredByDist(v, centroids)).getItem(0)

  /** The `take` L2-nearest centroid ids for a vector, ascending by
    * (dist, cid) — [[assign]]'s single-nearest pick generalized to the
    * top-n MULTI-assignment trained SemDeDup uses
    * ([[Similarity.semanticDupPairsTrained]]): `take = 1` head equals
    * `assign`'s cluster by construction (same scored array, same sort).
    */
  def nearestLists(v: Column, centroids: Seq[Seq[Double]],
      take: Int): Column =
    transform(slice(array_sort(scoredByDist(v, centroids)), 1, take),
      s => s.getField("cid"))

  // ONE native node instead of a k-way array(struct(aggregate(zip_with)))
  // fold: bit-identical dists/ties (see [[graft.expressions
  // .L2ScoredByMatrix]]), but a primitive double loop per row and a
  // plan tree that no longer carries k·dim literal leaves through
  // analysis/codegen at every assignment, trained-list, and IVF site.
  // The elementwise double cast mirrors l2DistanceSq's asDouble.
  private def scoredByDist(v: Column, centroids: Seq[Seq[Double]]): Column =
    graft.expressions.MatrixDistances.l2ScoredByMatrix(
      v.cast("array<double>"), centroids)

  /** SSL-prototype data pruning (Sorscher, Geirhos, Shekhar et al.
    * 2022, "Beyond neural scaling laws: beating power law scaling via
    * data pruning"): a document's PROTOTYPICALITY is its closeness to
    * its cluster centroid, and the beat-the-power-law recipe keeps the
    * HARDEST (least prototypical) examples when data is abundant.
    * Every row gains `cluster`, `dist_sq` ([[assign]]'s nearest-
    * centroid pick), and `kept` — true for the `ceil(keepPct% · |c|)`
    * FARTHEST rows of each cluster by the (dist_sq DESC, id ASC) total
    * order. The keep rule is exact integer arithmetic
    * (`(rank−1)·100 < |c|·keepPct` ⇔ rank ≤ ceil(|c|·keepPct/100)), so
    * the kept SET replays bit-identically on any engine (distances are
    * the house IEEE fold; ordering doubles is engine-exact).
    *
    * Scale shape: assignment is map-only against the centroid literal;
    * the rank is ONE keyed window partitioned by cluster. Partitions =
    * k — at corpus scale pick k so clusters stay executor-sized (the
    * SemDeDup k ~ √n argument); for fixed tiny k over a 100 TB table,
    * derive a per-cluster dist THRESHOLD from a quantile sketch
    * instead of ranking ([[QuantileSketch]]) — same contract, no
    * cluster-wide sort.
    */
  def pruneEasiest(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], keepPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct $keepPct")
    val r = ranked(vectors, idCol, vecCol, centroids)
    r.withColumn("kept",
        (col("__rn") - 1) * 100 < col("__nc") * lit(keepPct))
      .drop("__rn", "__nc")
  }

  /** The [[pruneEasiest]] operating-point curve: one row per
    * (keep_pct, cluster) with the cluster size, kept count, and kept
    * inertia (`round(Σ dist_sq, 2)` — the q87 grid) — how a selection
    * pipeline prices each notch of pruning strictness. The rank runs
    * ONCE; the sweep is a bounded explode over `keepPcts` (the q345
    * threshold-sweep device), never a re-rank per point.
    */
  def pruneSweep(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], keepPcts: Seq[Int]): DataFrame = {
    require(keepPcts.nonEmpty && keepPcts.size <= 100 &&
      keepPcts.forall(p => p >= 0 && p <= 100),
      s"keepPcts $keepPcts out of range")
    ranked(vectors, idCol, vecCol, centroids)
      .withColumn("keep_pct",
        explode(array(keepPcts.map(lit): _*)))
      .withColumn("__kept",
        (col("__rn") - 1) * 100 < col("__nc") * col("keep_pct"))
      .groupBy(col("keep_pct"), col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        round(sum(when(col("__kept"), col("dist_sq"))), 2)
          .as("inertia_kept"))
  }

  /** [[assign]] plus the per-cluster hardness rank `__rn` (dist_sq
    * DESC, id ASC) and cluster size `__nc` — the shared stage of
    * [[pruneEasiest]] and [[pruneSweep]]. `keepPct` must be 0..100.
    */
  private def ranked(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = assign(vectors, idCol, vecCol, centroids)
    val wRank = Window.partitionBy(col("cluster"))
      .orderBy(col("dist_sq").desc, col(idCol))
    val wAll = Window.partitionBy(col("cluster"))
    a.withColumn("__rn", row_number().over(wRank))
      .withColumn("__nc", count(lit(1)).over(wAll))
  }

  /** Centroid silhouette — the clustering-QA readout: per vector,
    * `s = (d₂ − d₁)/d₂` where d₁/d₂ are the L2 distances to the
    * nearest and second-nearest centroids (the simplified silhouette
    * of Hruschka et al.: centroid distances stand in for mean
    * pairwise ones, so the whole audit is MAP-ONLY over the k-row
    * centroid literal — no pair join at any corpus size). s ∈ [0, 1]:
    * near 0 = the vector sits on a cluster boundary, near 1 = firmly
    * inside. Returns per cluster `(cluster, n, mean_silhouette,
    * min_silhouette)` — the register a k-choice sweep or a
    * degenerate-cluster alarm reads. Distances snap on the
    * [[graft.functions.Grid]]; the per-vector score is one fixed
    * float expression (engine-exact); the cluster mean follows the
    * house 1e-4 aggregate snap.
    */
  def centroidSilhouette(vectors: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.size >= 2,
      s"silhouette needs >= 2 centroids, got ${centroids.size}")
    import graft.functions.Grid
    val two = slice(array_sort(
      scoredByDist(transform(col(vecCol), x => x.cast("double")),
        centroids)), 1, 2)
    vectors
      .withColumn("__s2", two)
      .withColumn("cluster", col("__s2").getItem(0).getField("cid"))
      .withColumn("__d1",
        sqrt(col("__s2").getItem(0).getField("dist")))
      .withColumn("__d2",
        sqrt(col("__s2").getItem(1).getField("dist")))
      .withColumn("sil",
        when(col("__d2") > 0,
          Grid.snap((col("__d2") - col("__d1")) / col("__d2")))
          .otherwise(lit(0.0)))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        Grid.snap(avg(col("sil")), 4).as("mean_silhouette"),
        Grid.snap(min(col("sil"))).as("min_silhouette"))
  }
}
