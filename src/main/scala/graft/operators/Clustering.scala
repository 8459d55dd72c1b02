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
    for (_ <- 0 until iters) {
      val updated = assign(vectors, idCol, vecCol, cents)
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

  private def scoredByDist(v: Column, centroids: Seq[Seq[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      struct(VF.l2DistanceSq(v, typedLit(c)).as("dist"),
        lit(i).as("cid"))
    }: _*)
}
