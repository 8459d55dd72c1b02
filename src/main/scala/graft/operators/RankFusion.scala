package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion — combining several incomparable quality signals (a
  * heuristic score, a classifier logit, an LM log-prob) into ONE
  * selection ranking without inventing scale factors: each signal
  * contributes only its RANK, and documents score
  * `Σ 1 / (k + rank_i)` over the rankings that contain them —
  * Reciprocal Rank Fusion (Cormack et al. 2009), the standard hybrid
  * fusion in retrieval stacks, applied here to corpus curation (blend
  * "classifier thinks educational" with "LM thinks fluent" with
  * "heuristics think clean" and keep the consensus top).
  *
  * 100 TB shape: ranks are COMPETITION ranks (1 + count of strictly
  * better scores) computed on the bounded (score, count) histogram —
  * signals arrive grid-rounded (the library's 1e-4 convention), the
  * cumulative window runs over that bounded table, and documents get
  * their rank back through one un-hinted score equi-join (the
  * [[NgramLm.perplexityBuckets]] device; a `rank()` window over the
  * documents themselves would funnel the corpus through one
  * partition). Ties share a rank by construction, so no arbitrary
  * per-document ordering exists anywhere.
  */
object RankFusion {

  /** Attach `rankCol` = competition rank of `scoreCol` (descending:
    * rank 1 = best, ties share). `scoreCol` must be grid-rounded — a
    * raw-double score makes the histogram corpus-sized.
    */
  def competitionRank(scored: DataFrame, scoreCol: String,
      rankCol: String): DataFrame = {
    // the caller's scored frame is often an expensive trained chain
    // (q137 fuses an NB classifier, an LM scoring, and a heuristic);
    // it feeds BOTH the histogram and the join-back below, so pin it
    // once (CacheScope contract) — unpersisted, every fused signal's
    // whole upstream ran twice (q137 measured ~2x on the composition).
    // Without an active scope the persist would be stranded for the
    // session lifetime (register is a no-op) — warn like
    // CorpusPipeline.prepare does instead of leaking silently.
    if (!graft.CacheScope.isActive)
      System.err.println("[graft] RankFusion.competitionRank called " +
        "without an active CacheScope: its internal persist cannot be " +
        "released by the caller and will be stranded for the session " +
        "lifetime. Wrap the call + your action in CacheScope.scoped {...}.")
    val sc = graft.CacheScope.register(scored.persist())
    val hist = sc.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("__rf_c"))
    // competition rank = (exclusive cum of better-score counts) + 1,
    // via the ordered prefix scan on the score histogram — exact
    // integer subtraction, no unpartitioned window
    val ranks = Ranks.withOrderedPrefixScan(hist,
        Seq(col(scoreCol).desc), Seq("__rf_c" -> "__rf_cum"))
      .withColumn(rankCol, col("__rf_cum") - col("__rf_c") + 1L)
      .select(col(scoreCol), col(rankCol))
    sc.join(ranks, Seq(scoreCol)) // un-hinted score join-back
  }

  /** Fuse named rankings: each element is `(name, frame)` where the
    * frame carries `idCol` and a grid-rounded `score` column (higher =
    * better). Returns one row per document appearing in ANY ranking:
    * `(idCol, rank_<name>..., rrf)` with
    * `rrf = Σ_present 1 / (k + rank_i)` — a document missing from a
    * ranking (e.g. too short for the LM) contributes nothing for it
    * and carries a null `rank_<name>`.
    */
  def reciprocalRankFusion(rankings: Seq[(String, DataFrame)],
      idCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    require(k >= 0, s"bad k $k")
    val names = rankings.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate ranking names: $names")
    val tagged = rankings.map { case (name, df) =>
      competitionRank(df.select(col(idCol), col("score")),
          "score", "__rf_r")
        .select(col(idCol), lit(name).as("__rf_n"), col("__rf_r"))
    }.reduce(_ unionByName _)
    val aggs = names.map(n =>
      max(when(col("__rf_n") === n, col("__rf_r"))).as(s"rank_$n")) :+
      round(sum(lit(1.0) / (lit(k) + col("__rf_r"))), 6).as("rrf")
    tagged.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}
