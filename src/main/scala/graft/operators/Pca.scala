package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PCA for embedding diagnostics — the top principal
  * component of an `array<float>` column, via the classic two-phase
  * shape that scales to any corpus:
  *
  *   1. ONE corpus pass reduces the data to the d²-bounded covariance
  *      table: each row emits its d×(d+1)/2 upper-triangle products
  *      map-side (the explode fuses with hash partial aggregation, so
  *      the SHUFFLE carries at most d² rows per partition — the corpus
  *      never moves). d = 64 → 2 080 cells; broadcast-safe forever.
  *   2. Power iteration runs entirely on that bounded table: k rounds
  *      of matvec + L2 normalization, each re-rounded to the 1e-6 grid
  *      (the [[Markov]]/k-means trajectory-pinning device).
  *
  * Portability: covariance cells are pinned at 1e-8 (re-associated
  * sums agree there at any realistic magnitude), the iteration grid at
  * 1e-6; sign is fixed by convention (the largest-|loading| entry is
  * made positive, ties to the smaller index) because v and −v are the
  * same component.
  *
  * The top component tells an embedding pipeline whether one axis
  * dominates (anisotropy — common with poorly normalized encoders) and
  * feeds whitening/de-meaning decisions.
  */
object Pca {

  /** Population covariance as a (i, j, cov) table over BOTH triangles,
    * 1-based indices, cov pinned at 1e-8. One corpus pass.
    */
  def covarianceMatrix(vectors: DataFrame, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    // upper-triangle outer product per row, map-side; i/j are 1-based.
    // The struct stream fuses with partial aggregation — the shuffle
    // sees d²/2 cells per partition, not n·d² rows.
    val cells = vectors
      .select(vd.as("__v"))
      .select(explode(flatten(transform(col("__v"),
        (x, i) => transform(slice(col("__v"), i + 1, size(col("__v"))),
          (y, j) => struct((i + 1).as("i"), (i + 1 + j).as("j"),
            (x * y).as("xy")))))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.xy")).as("sxy"), count(lit(1)).as("__n"))
    val means = vectors
      .select(posexplode(vd).as(Seq("__p", "__x")))
      .groupBy((col("__p") + 1).as("i"))
      .agg(sum(col("__x")).as("sx"), count(lit(1)).as("__n"))
      .select(col("i"), (col("sx") / col("__n")).as("mean"))
    val upper = cells
      .join(means.select(col("i"), col("mean").as("__mi")), Seq("i"))
      .join(means.select(col("i").as("j"), col("mean").as("__mj")),
        Seq("j"))
      .select(col("i"), col("j"),
        round(col("sxy") / col("__n") - col("__mi") * col("__mj"), 8)
          .as("cov"))
    // mirror the strict-upper cells; the diagonal appears once
    upper.union(upper.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("cov")))
  }

  /** Hotelling deflation: C' = C − λ·v·vᵀ removes the top component
    * from the covariance table, so another [[topComponent]] pass finds
    * the SECOND component. All operands are grid-pinned (cov 1e-8,
    * loading/eigenvalue 1e-6), so the deflated cells replay; output
    * re-pins at 1e-8. Bounded-table arithmetic only.
    */
  def deflate(cov: DataFrame, component: DataFrame): DataFrame = {
    val vi = component.select(col("i"), col("loading").as("__li"),
      col("eigenvalue").as("__ev"))
    val vj = component.select(col("i").as("j"),
      col("loading").as("__lj"))
    cov.join(vi, Seq("i")).join(vj, Seq("j"))
      .select(col("i"), col("j"),
        round(col("cov") - col("__ev") * col("__li") * col("__lj"), 8)
          .as("cov"))
  }

  /** Scalar projection of every vector onto a (i, loading) component
    * table (1-based i): one posexplode + an equi-join against the
    * d-row component (broadcast by size) + one id-grain aggregation —
    * map-shaped, no corpus shuffle beyond the final groupBy.
    */
  def projectOnto(vectors: DataFrame, idCol: String, vecCol: String,
      component: DataFrame): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    vectors
      .select(col(idCol), posexplode(vd).as(Seq("__p", "__x")))
      .select(col(idCol), (col("__p") + 1).as("i"), col("__x"))
      .join(component.select(col("i"), col("loading")), Seq("i"))
      .groupBy(col(idCol))
      .agg(sum(col("__x") * col("loading")).as("proj"))
  }

  /** k-round power iteration on the bounded covariance table: returns
    * (i, loading) for the sign-fixed unit top component plus the
    * Rayleigh-quotient eigenvalue estimate as column `eigenvalue`
    * (constant across rows — the matvec norm of the last round).
    */
  /** Spark `round(_, 6)` on a double, replicated exactly (HALF_UP on
    * the decimal string expansion — `scala.math.BigDecimal(x)` is what
    * the Round expression constructs).
    */
  private def r6(x: Double): Double =
    // Spark's Round passes NaN/Infinity through unchanged;
    // BigDecimal(NaN) would throw instead (a degenerate all-zero
    // covariance reaches this via 0/0) — guard exactly like Spark
    if (x.isNaN || x.isInfinite) x
    else scala.math.BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  def topComponent(cov: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    // the covariance table feeds this collect AND the caller's deflate
    // pass — persist it for the call (CacheScope contract) so the
    // corpus pass behind it runs ONCE
    val covC = graft.CacheScope.register(cov.persist())
    // The iteration itself runs ON THE DRIVER: the covariance table is
    // a d²-BOUNDED fact (the object doc's point — d = 64 → 2 080
    // cells, broadcast-safe forever), the same bounded-fact class as
    // the k×dim centroid matrix [[Clustering.kmeansCentroids]] already
    // collects per Lloyd round. The previous form ran each matvec as a
    // Spark round (join + agg + localCheckpoint + broadcast ≈ 2 jobs
    // per iteration — 16 jobs for an 8-round component, 32+ for q217's
    // two components, all over a ≤ d-row table); collecting once and
    // folding in-process removes every one of those jobs while the
    // corpus-grain work (the ONE covariance pass) is untouched. Every
    // intermediate is re-rounded to the SAME 1e-6 grid with Spark's
    // own HALF_UP rule, so the trajectory replays exactly as before —
    // re-associated sums agree on the grid (the object doc's
    // portability contract, unchanged).
    val cells = covC.select(col("i"), col("j"), col("cov")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    // dims from the UNION of i and j: a covariance table where some j
    // never appears as an i (e.g. a strict-upper-triangle table from
    // outside covarianceMatrix/deflate) must not throw on mat(idx(j))
    // — the old join-based matvec silently tolerated such cells
    val dims = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val d = dims.length
    require(d >= 1 && d <= 4096, s"covariance dimension $d out of [1, 4096]")
    val idx = dims.zipWithIndex.toMap
    // dense d×d matrix; rows in ascending j order per i so the matvec
    // fold order is fixed (any order agrees on the 1e-6 grid)
    val mat = Array.ofDim[Double](d, d)
    cells.foreach { case (i, j, c) => mat(idx(i))(idx(j)) = c }
    var x = Array.fill(d)(r6(1.0 / math.sqrt(d.toDouble)))
    var lastNorm = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += mat(i)(j) * x(j); j += 1 }
        r6(acc)
      }
      var n2 = 0.0
      var i = 0
      while (i < d) { n2 += w(i) * w(i); i += 1 }
      lastNorm = r6(math.sqrt(n2))
      x = w.map(wi => r6(wi / lastNorm))
    }
    // sign convention: the largest-|x| entry (ties: smaller i) positive
    val pickIdx = dims.indices.minBy(i => (-math.abs(x(i)), dims(i)))
    val sgn = math.signum(x(pickIdx))
    val s = if (sgn == 0.0) 1.0 else sgn
    val norm = lastNorm
    val spark = cov.sparkSession
    import spark.implicits._
    dims.indices.map(i => (dims(i), r6(x(i) * s), norm))
      .toDF("i", "loading", "eigenvalue")
  }
}
