package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd's k-means determinism and convergence, plus the LSH parameter
  * planner's S-curve algebra.
  */
class ClusteringSpec extends SparkSpec {

  private lazy val vectors =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeans assignment is total, deterministic, and ids every cluster " +
      "in [0, k)") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 4, iters = 2)
    assert(cents.size === 4 && cents.forall(_.size === 64))
    val again = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 4, iters = 2)
    assert(cents === again, "two runs must produce identical centroids")
    val assigned = Clustering.assign(vectors, "vec_id", "embedding", cents)
    assert(assigned.count() === vectors.count())
    val ids = assigned.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(ids.subsetOf((0 until 4).toSet))
    // nearestLists take=1 head IS assign's cluster (same scored array,
    // same (dist, cid) sort — the multi-assignment's base case)
    val mismatch = assigned
      .withColumn("nl",
        Clustering.nearestLists(col("embedding"), cents, 1).getItem(0))
      .filter(col("nl") =!= col("cluster")).count()
    assert(mismatch === 0L, "nearestLists(1) diverged from assign")
  }

  test("Lloyd updates do not increase inertia (up to the 1e-6 centroid " +
      "grid)") {
    def inertia(iters: Int): Double = {
      val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
        k = 4, iters = iters)
      Clustering.assign(vectors, "vec_id", "embedding", cents)
        .agg(sum(col("dist_sq"))).collect().head.getDouble(0)
    }
    val i0 = inertia(0)
    val i1 = inertia(1)
    val i2 = inertia(2)
    assert(i1 <= i0 + 1e-3, s"update 1 raised inertia: $i0 -> $i1")
    assert(i2 <= i1 + 1e-3, s"update 2 raised inertia: $i1 -> $i2")
    info(f"inertia: init $i0%.1f -> iter1 $i1%.1f -> iter2 $i2%.1f")
  }

  test("empty clusters keep their previous centroid") {
    val s = spark
    import s.implicits._
    // two far-apart groups of near-identical vectors (dim-64 padded),
    // k=3: the third centroid (init = third-smallest id, inside group A)
    // captures nothing after the first update and must persist unchanged
    def vec(base: Double): Seq[Float] =
      (0 until 64).map(j => (base + j * 1e-4).toFloat)
    val rows = Seq(
      (0L, vec(0.0)), (1L, vec(0.001)), (2L, vec(100.0)),
      (3L, vec(0.002)), (4L, vec(100.001)), (5L, vec(100.002)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Clustering.kmeansCentroids(df, "vec_id", "embedding",
      k = 3, iters = 2)
    assert(cents.size === 3)
    // cluster 2's init is vec(100.0); after update it still centers there
    assert(math.abs(cents(2).head - 100.0) < 1.0)
  }

  test("LshPlanner: 16 slots at threshold 0.7 split 4x4, and the S-curve " +
      "separates the threshold's two sides") {
    val p = LshPlanner.plan(16, 0.7)
    assert((p.bands, p.rows) === ((4, 4)))
    assert(math.abs(p.midpoint - 0.707) < 0.01)
    // steepness: collision prob is high above the midpoint, low below
    assert(p.collisionProbability(0.9) > 0.9)
    assert(p.collisionProbability(0.4) < 0.1)
    assert(p.missProbability(0.9) + p.collisionProbability(0.9) === 1.0)
    // a 0.9-threshold plan shifts to fewer bands x more rows
    val tight = LshPlanner.plan(16, 0.9)
    assert(tight.rows > p.rows)
    // monotone in s
    val probs = (1 to 9).map(i => p.collisionProbability(i / 10.0))
    assert(probs === probs.sorted)
  }

  test("centroidSilhouette: tight well-separated blobs score near 1, " +
      "a boundary point near 0, scores stay in [0, 1]") {
    val s = spark
    import s.implicits._
    // two blobs on a 4-dim axis at 0 and 100, plus one midpoint vector
    val rows =
      (0 until 20).map(i => (i.toLong,
        Array.fill(4)(0.0f + (i % 3) * 0.1f))) ++
      (20 until 40).map(i => (i.toLong,
        Array.fill(4)(100.0f + (i % 3) * 0.1f))) ++
      Seq((99L, Array.fill(4)(50.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Clustering.kmeansCentroids(df, "vec_id", "embedding",
      k = 2, iters = 2)
    val per = Clustering.centroidSilhouette(df, "vec_id", "embedding",
      cents).collect()
    val all = per.map(r => (r.getAs[Long]("n"),
      r.getAs[Double]("mean_silhouette"), r.getAs[Double]("min_silhouette")))
    assert(per.length === 2)
    assert(all.map(_._1).sum === 41L)
    // blob members sit at ~1; the midpoint drags ONE cluster's min
    // toward 0 but means stay high
    assert(all.forall(_._2 > 0.9), s"means: ${all.toSeq}")
    assert(all.exists(_._3 < 0.05), s"mins: ${all.toSeq}")
    assert(all.forall(t => t._3 >= 0.0 && t._2 <= 1.0))
    intercept[IllegalArgumentException] {
      Clustering.centroidSilhouette(df, "vec_id", "embedding",
        cents.take(1))
    }
  }

  test("pruneEasiest keeps exactly ceil(pct·|c|/100) hardest per " +
      "cluster, ties to the smaller id, 0/100 degenerate cleanly") {
    val s = spark
    import s.implicits._
    // one cluster at 0 with distances 0,1,4,9,16 (5 rows), one at 100
    // with 2 rows; centroids fixed so the test pins the keep rule only
    val df = Seq(
      (1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(2f)), (4L, Seq(3f)),
      (5L, Seq(4f)), (10L, Seq(100f)), (11L, Seq(99f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(Seq(0.0), Seq(100.0))
    val kept = Clustering.pruneEasiest(df, "vec_id", "embedding",
        cents, keepPct = 50)
      .filter(col("kept")).select("vec_id").as[Long].collect().toSet
    // cluster 0: ceil(5·50/100)=3 hardest → dist 16,9,4 → ids 5,4,3;
    // cluster 1: ceil(2·50/100)=1 hardest → dist 1 vs 0 → id 11
    assert(kept === Set(5L, 4L, 3L, 11L))
    val none = Clustering.pruneEasiest(df, "vec_id", "embedding",
      cents, keepPct = 0).filter(col("kept")).count()
    assert(none === 0L)
    val all = Clustering.pruneEasiest(df, "vec_id", "embedding",
      cents, keepPct = 100).filter(col("kept")).count()
    assert(all === 7L)
    // equal-distance tie: both at dist 1, keep ceil(3·33/100) = 1 →
    // smaller id kept
    val tie = Seq((7L, Seq(1f)), (8L, Seq(-1f)), (9L, Seq(0f)))
      .toDF("vec_id", "embedding")
    val tk = Clustering.pruneEasiest(tie, "vec_id", "embedding",
        Seq(Seq(0.0)), keepPct = 33)
      .filter(col("kept")).select("vec_id").as[Long].collect().toSet
    assert(tk === Set(7L))
    intercept[IllegalArgumentException] {
      Clustering.pruneEasiest(df, "vec_id", "embedding", cents, 101)
    }
  }

  test("pruneSweep matches pruneEasiest at each pct and is " +
      "partitioning-invariant") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map(i =>
      (i, Seq((i % 9).toFloat, (i % 5).toFloat))).toDF("vec_id", "embedding")
    val cents = Clustering.kmeansCentroids(df, "vec_id", "embedding",
      k = 3, iters = 2)
    val sweep = Clustering.pruneSweep(df, "vec_id", "embedding", cents,
        Seq(25, 75))
      .select("keep_pct", "cluster", "n", "n_kept")
      .as[(Int, Int, Long, Long)].collect().toSet
    val single = Seq(25, 75).flatMap { p =>
      Clustering.pruneEasiest(df, "vec_id", "embedding", cents, p)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .select(lit(p).as("keep_pct"), col("cluster"), col("n"),
          col("n_kept"))
        .as[(Int, Int, Long, Long)].collect()
    }.toSet
    assert(sweep === single)
    val rep = Clustering.pruneSweep(df.repartition(7), "vec_id",
        "embedding", cents, Seq(25, 75))
      .select("keep_pct", "cluster", "n", "n_kept")
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(rep === sweep)
    intercept[IllegalArgumentException] {
      Clustering.pruneSweep(df, "vec_id", "embedding", cents, Nil)
    }
  }
}
