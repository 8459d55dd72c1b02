package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry preference strengths from pairwise contests — the
  * model behind preference-data curation (RLHF reward baselines,
  * chatbot-arena-style leaderboards, annotator consistency checks):
  * item i beats j with probability p_i / (p_i + p_j), and the MM
  * update (Hunter 2004, "MM algorithms for generalized Bradley–Terry
  * models", Ann. Statist. 32(1)) iterates
  * `p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)`, which monotonically
  * climbs the likelihood.
  *
  * Execution shape: contests collapse ONCE to the bounded directed
  * pair table (≤ maxItems² rows — a billion preference rows cost one
  * aggregation); the R MM rounds then run DRIVER-SIDE over that
  * collected bounded table (the [[Clustering.kmeansCentroids]]
  * discipline: a config-bounded aggregate is a driver fact, and
  * iterating it in Scala costs neither per-round jobs nor the
  * 3^rounds lineage a DataFrame loop would have to checkpoint away).
  * The alphabet guard runs distributively BEFORE the collect.
  *
  * Replay discipline: each round's per-item denominator folds its
  * opponent terms in ASCENDING OPPONENT ORDER (pinned IEEE order),
  * each term and each updated strength snaps via [[Grid.snapD]] —
  * the same float program the SQL snap runs, so an oracle replays
  * the trajectory bit-exactly — and identifiability is fixed by
  * ANCHORING at the strongest item, ties to the lesser name (a
  * single-value divide, order-free; strengths land in (0, 1] so
  * opponent terms never underflow the term grid)
  * rather than a sum normalization whose accumulation order would be
  * engine-dependent. Strengths floor at the 1e-6 grid resolution so
  * a winless item stays a valid denominator instead of collapsing
  * the next round to 0/0.
  */
object Preference {

  def bradleyTerry(contests: DataFrame, winnerCol: String,
      loserCol: String, rounds: Int = 10,
      maxItems: Int = 64): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"bad rounds $rounds")
    require(maxItems >= 2 && maxItems <= 256, s"bad maxItems $maxItems")
    val games = contests.select(
      col(winnerCol).cast("string").as("w"),
      col(loserCol).cast("string").as("l"))
    // the ONE corpus aggregation: directed contest counts, bounded at
    // maxItems^2 rows — everything downstream derives from it
    val directed = games.groupBy(col("w"), col("l"))
      .agg(count(lit(1)).as("n"))
      .persist()
    try {
      // bounded-alphabet guard BEFORE any driver collect (the Shapley
      // discipline): count distinct items distributively first
      val nItems = directed
        .select(col("w").as("i")).unionAll(directed.select(col("l")))
        .agg(countDistinct(col("i")).as("n")).head().getLong(0)
      require(nItems >= 2 && nItems <= maxItems,
        s"item alphabet $nItems outside [2, $maxItems] — Bradley–Terry " +
          "is a bounded-leaderboard device, not a corpus-grain ranker")
      // the MM rounds run DRIVER-SIDE over the collected bounded table
      // (the kmeansCentroids discipline: a config-bounded aggregate is
      // a driver fact; iterating it in Scala costs neither jobs nor
      // lineage, where a DataFrame loop would checkpoint every round).
      // Grid.snapD is the same IEEE program the SQL snap runs, so the
      // trajectory replays engine-exactly all the same.
      val dRows = directed.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val items = dRows.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val nij = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      val winsOf = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      dRows.foreach { case (w, l, n) =>
        nij((w, l)) += n; nij((l, w)) += n; winsOf(w) += n
      }
      val opponents = items.map(i => i ->
        items.filter(j => j != i && nij((i, j)) > 0L)).toMap
      var p = items.map(i => i -> 1.0).toMap
      for (_ <- 1 to rounds) {
        val raw = items.map { i =>
          // ascending-opponent fold: pinned IEEE order, terms snapped
          val den = opponents(i).foldLeft(0.0) { (a, j) =>
            a + Grid.snapD(nij((i, j)).toDouble / (p(i) + p(j)))
          }
          // den can reach 0 when every opponent strength is enormous
          // relative to n_ij (terms snap to 0) — floor rather than
          // 0/0 = NaN poisoning the anchor and every later round
          i -> (if (den > 0.0)
            math.max(Grid.snapD(winsOf(i).toDouble / den), 1e-6)
          else 1e-6)
        }.toMap
        // anchor at the STRONGEST item (ties to the lesser name): all
        // strengths land in (0, 1], so opponent terms n/(p_i + p_j)
        // never underflow the 1e-6 term grid — anchoring at the first
        // item would let a winless lexicographic head (floored to
        // 1e-6) inflate everything by ~1e6 and zero the terms
        val anchor = raw(items.maxBy(i => (raw(i), -items.indexOf(i))))
        p = items.map(i => i -> Grid.snapD(raw(i) / anchor)).toMap
      }
      val out = items.map { i =>
        (i, winsOf(i), items.map(j => nij((i, j))).sum, p(i))
      }
      val spark = contests.sparkSession
      import spark.implicits._
      out.toSeq.toDF("item", "n_wins", "n_games", "strength")
    } finally directed.unpersist()
  }
}
