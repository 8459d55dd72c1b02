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
  * Execution shape: contests collapse ONCE to the bounded pair table
  * (`n_ij`, ≤ maxItems² rows) and the per-item win vector; the R MM
  * rounds run as DataFrame algebra on those bounded frames only — the
  * [[Graph.pageRank]] loop discipline, never touching the contest
  * corpus again. A billion preference rows cost one aggregation.
  *
  * Replay discipline: each round's per-item denominator folds its
  * opponent terms in ASCENDING OPPONENT ORDER (sort_array + aggregate
  * HOF — IEEE addition is deterministic once the order is pinned, so
  * no mid-fold snap is needed), each term and each updated strength
  * snap to the 1e-6 [[Grid]], and identifiability is fixed by
  * ANCHORING (dividing by the first item's strength — a single-value
  * divide, order-free) rather than by a sum normalization whose
  * accumulation order would be engine-dependent. Strengths floor at
  * the 1e-6 grid resolution so a winless item stays a valid
  * denominator instead of collapsing the next round to 0/0.
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
    // maxItems² rows and PINNED — pairs, wins, items, and every MM
    // round derive from this cache, so the contest corpus is scanned
    // exactly once however many rounds run
    val directed = graft.CacheScope.register(
      games.groupBy(col("w"), col("l")).agg(count(lit(1)).as("n"))
        .persist())
    val pairs = directed
      .select(col("w").as("i"), col("l").as("j"), col("n"))
      .unionAll(directed
        .select(col("l").as("i"), col("w").as("j"), col("n")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).cast("double").as("nij"))
    val nItems = pairs.agg(countDistinct(col("i")).as("n"))
      .head().getLong(0)
    require(nItems >= 2 && nItems <= maxItems,
      s"item alphabet $nItems outside [2, $maxItems] — Bradley–Terry " +
        "is a bounded-leaderboard device, not a corpus-grain ranker")
    val wins = directed.groupBy(col("w").as("i"))
      .agg(sum(col("n")).cast("double").as("wi"),
        sum(col("n")).as("n_wins"))
    val items = pairs.select(col("i")).distinct()
    val w0 = items.join(wins, Seq("i"), "left")
      .select(col("i"), coalesce(col("wi"), lit(0.0)).as("wi"),
        coalesce(col("n_wins"), lit(0L)).as("n_wins"))
    val nGames = pairs.groupBy(col("i"))
      .agg(sum(col("nij")).cast("long").as("n_games"))
    var p = items.select(col("i"), lit(1.0).as("p"))
    for (_ <- 1 to rounds) {
      val den = pairs
        .join(p.select(col("i"), col("p").as("__pi")), Seq("i"))
        .join(p.select(col("i").as("j"), col("p").as("__pj")), Seq("j"))
        .withColumn("__term",
          Grid.snap(col("nij") / (col("__pi") + col("__pj"))))
        .groupBy(col("i"))
        .agg(expr("aggregate(sort_array(collect_list(" +
          "struct(j, __term))), CAST(0.0 AS DOUBLE), " +
          "(a, x) -> a + x.__term)").as("__den"))
      val raw = w0.join(den, Seq("i"))
        .select(col("i"),
          greatest(Grid.snap(col("wi") / col("__den")), lit(1e-6))
            .as("p"))
      val anchor = raw.orderBy(col("i")).limit(1)
        .select(col("p").as("__anchor"))
      // per-round lineage truncation (the Graph.pageRank discipline):
      // each round references the previous strengths THREE times
      // (both join sides of the pair table plus the anchor), so an
      // un-truncated plan grows 3^rounds and analysis alone hangs
      p = raw.crossJoin(broadcast(anchor))
        .select(col("i"), Grid.snap(col("p") / col("__anchor")).as("p"))
        .localCheckpoint(true)
    }
    w0.select(col("i"), col("n_wins")).join(nGames, Seq("i"))
      .join(p, Seq("i"))
      .select(col("i").as("item"), col("n_wins"), col("n_games"),
        col("p").as("strength"))
  }
}
