package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coreset selection over an embedding column — the k-center greedy
  * (farthest-first traversal) algorithm of Gonzalez 1985, the device
  * behind coreset-based data selection for training pipelines (Sener &
  * Savarese 2018's active-learning coreset): pick the point farthest
  * from everything selected so far, k times. The selected set is a
  * 2-approximation of the optimal k-center cover, and the trajectory of
  * "farthest distance at selection time" is the (non-increasing)
  * coverage-radius curve a data-selection run reads to choose k.
  *
  * Determinism: seed = smallest id; each round's pick orders by
  * (min-dist-to-selected DESC, id ASC) — a total order, so ties (exact
  * duplicates, symmetric layouts) resolve identically on any engine.
  * Distances are the house L2 fold ([[VF.l2DistanceSq]] — ascending-
  * index IEEE fold, the kmDist oracle pairing) and the min over
  * selected centers is an exact double `least`, which is associative —
  * so the whole trajectory replays bit-for-bit.
  *
  * 100 TB shape: k passes over the corpus, each a MAP against a
  * ≤ `maxK`-row center literal followed by a global top-1 reduction
  * (TakeOrdered — a per-partition heap then a driver merge, never a
  * global sort). The vector table is scope-cached across rounds and
  * widened to session parallelism when the scan arrives narrow (the
  * [[Clustering.kmeansCentroids]] device). Selected centers live on the
  * driver BY CONTRACT (`maxK` ≤ 256 rows of dim doubles) — the bounded-
  * fact discipline, not a corpus collect.
  */
object Coreset {

  /** Exact min squared L2 distance from `v` to the literal `centers`
    * (associative `least` chain — order-free). Shared by the batch
    * selection loop, the final assignment, and the streaming form
    * (stateless, so it runs on a stream as-is).
    */
  def minDistSq(v: Column, centers: Seq[Seq[Double]]): Column =
    centers.map(c => VF.l2DistanceSq(v, typedLit(c))).reduce(least(_, _))

  /** The k-round farthest-first trajectory: one row per selected
    * center, `(k_idx, vec_id, dist_sq)` where `dist_sq` is the
    * selected point's min squared distance to the previously selected
    * set on the 1e-6 grid — the coverage radius² right before this
    * center was added (0.0 for the seed, which is chosen by min id,
    * not distance). `k_idx` orders the trajectory.
    */
  def kCenterGreedy(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, maxK: Int = 64): DataFrame = {
    require(k >= 1 && k <= maxK && maxK <= 256,
      s"k $k out of [1, $maxK] (maxK <= 256)")
    val spark = vectors.sparkSession
    val base = vectors.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    // the per-round distance map is the k·dim hot loop — widen a
    // narrow scan to session parallelism and scope-cache across
    // rounds (the kmeansCentroids device)
    val par = spark.sparkContext.defaultParallelism
    val wide = if (base.rdd.getNumPartitions < par)
      base.repartition(par) else base
    val src = if (k > 1) graft.CacheScope.register(wide.persist())
      else wide
    val seed = src.orderBy(col("vec_id")).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("empty vector table"))
    var selected = Vector((seed.getLong(0), seed.getSeq[Double](1).toSeq))
    var traj = Vector((0, seed.getLong(0), 0.0))
    for (i <- 1 until k) {
      val pick = src
        .withColumn("__mind", minDistSq(col("v"), selected.map(_._2)))
        .orderBy(col("__mind").desc, col("vec_id"))
        .limit(1).collect().head
      selected :+= ((pick.getLong(0), pick.getSeq[Double](1).toSeq))
      traj :+= ((i, pick.getLong(0),
        graft.functions.Grid.snapD(pick.getDouble(2))))
    }
    spark.createDataFrame(traj).toDF("k_idx", "vec_id", "dist_sq")
  }

  /** The selected center VECTORS of a [[kCenterGreedy]] run — what
    * [[assignToCenters]] and the streaming form consume.
    */
  def centers(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, maxK: Int = 64): Seq[Seq[Double]] = {
    val ids = kCenterGreedy(vectors, idCol, vecCol, k, maxK)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val byId = vectors
      .filter(col(idCol).cast("long").isin(ids.toSeq: _*))
      .select(col(idCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      .toMap
    ids.toSeq.map(byId)
  }

  /** [[kCenterGreedy]] per GROUP (the stratified form a per-language
    * or per-domain selection runs): every group gets its own k-round
    * farthest-first trajectory, but each round runs over ALL groups in
    * ONE distributed job — a map computing each row's min distance to
    * ITS OWN group's selected set (a per-group CASE over the bounded
    * center literals) followed by one KEYED window argmax
    * (row_number = 1 per group on (dist DESC, id)). k rounds × one
    * shuffle each, never a driver loop over groups re-scanning the
    * corpus per group.
    *
    * Group keys must be integral (cast to long — the bounded-contract
    * shape; `maxGroups` is require-checked distributively before the
    * seed collect). Output: `(groupCol, k_idx, vec_id, dist_sq)` with
    * the [[kCenterGreedy]] semantics per group.
    */
  def kCenterGreedyGrouped(vectors: DataFrame, idCol: String,
      vecCol: String, groupCol: String, k: Int, maxGroups: Int = 64,
      maxK: Int = 64): DataFrame = {
    require(k >= 1 && k <= maxK && maxK <= 256,
      s"k $k out of [1, $maxK] (maxK <= 256)")
    require(maxGroups >= 1 && maxGroups <= 1024, s"maxGroups $maxGroups")
    val spark = vectors.sparkSession
    import org.apache.spark.sql.expressions.Window
    val base = vectors.select(col(groupCol).cast("long").as("grp"),
      col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val par = spark.sparkContext.defaultParallelism
    val wide = if (base.rdd.getNumPartitions < par)
      base.repartition(par) else base
    val src = if (k > 1) graft.CacheScope.register(wide.persist())
      else wide
    val nGroups = src.select(col("grp")).distinct().count()
    require(nGroups >= 1 && nGroups <= maxGroups,
      s"$nGroups groups out of [1, $maxGroups]")
    // seeds: per group the min-id row (bounded: one per group)
    val seedW = Window.partitionBy(col("grp")).orderBy(col("vec_id"))
    val seeds = src.withColumn("__rn", row_number().over(seedW))
      .filter(col("__rn") === 1).drop("__rn")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2).toSeq))
    var selected: Map[Long, Vector[Seq[Double]]] =
      seeds.map { case (g, (_, v)) => g -> Vector(v) }.toMap
    var traj = seeds.toVector.map { case (g, (id, _)) => (g, 0, id, 0.0) }
    val pickW = Window.partitionBy(col("grp"))
      .orderBy(col("__mind").desc, col("vec_id"))
    for (i <- 1 until k) {
      val grps = selected.keys.toSeq.sorted
      val mind = grps.tail.foldLeft(
        when(col("grp") === grps.head,
          minDistSq(col("v"), selected(grps.head)))) { (acc, g) =>
        acc.when(col("grp") === g, minDistSq(col("v"), selected(g)))
      }
      val picks = src.withColumn("__mind", mind)
        .withColumn("__rn", row_number().over(pickW))
        .filter(col("__rn") === 1)
        .collect()
      picks.foreach { r =>
        val g = r.getLong(0)
        selected += g -> (selected(g) :+ r.getSeq[Double](2).toSeq)
        traj :+= ((g, i, r.getLong(1),
          graft.functions.Grid.snapD(r.getAs[Double]("__mind"))))
      }
    }
    spark.createDataFrame(traj)
      .toDF(groupCol, "k_idx", "vec_id", "dist_sq")
  }

  /** Every row plus its coverage distance to the selected set —
    * map-only against the center literal; stateless, so the same
    * Column program runs on a streaming frame unchanged.
    */
  def assignToCenters(vectors: DataFrame, vecCol: String,
      centers: Seq[Seq[Double]]): DataFrame = {
    require(centers.nonEmpty, "no centers")
    vectors.withColumn("cover_dist_sq",
      graft.functions.Grid.snap(minDistSq(col(vecCol), centers)))
  }
}
