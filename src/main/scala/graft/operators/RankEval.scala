package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — the evaluation harness for the retrieval
  * stack ([[Similarity]] ANN, [[SparseSimilarity.bm25TopK]],
  * [[RankFusion]]): given a candidate ranking and an exact truth set,
  * report recall@k, MRR, and NDCG@k. At engine scale the metric itself
  * is trivially bounded (both inputs are ≤ k rows per query); what
  * matters is that it exists INSIDE the gate, so every recall number
  * the ANN specs quote has a replay-checked query-level counterpart.
  *
  * Portability: recall and MRR are exact rationals off integer ranks;
  * the DCG folds run over the SORTED rank list (collect → array_sort →
  * left fold), so both engines add the irrational 1/log₂ terms in the
  * same ascending-rank order (the exp∘sum∘ln device, list-fold form),
  * rounded 4.
  */
object RankEval {

  /** One-row metric readout `(k, n_truth, n_hit, recall_at_k, mrr,
    * ndcg_at_k)` for `ranked` (carrying `itemCol` + 1-based `rankCol`;
    * a RANKING — one row per item, which every ranker in this repo
    * emits by construction)
    * against the `truth` item set. Binary relevance: a ranked item is
    * relevant iff it is in truth; IDCG is the all-relevant prefix of
    * length min(k, n_truth). MRR is null when nothing relevant was
    * retrieved (0 hits), the conventional "no reciprocal rank" verdict.
    */
  /** [[vsTruth]] keyed by a query column — one metric row PER QUERY
    * `(queryCol, n_truth, n_hit, recall_at_k, mrr, ndcg_at_k)`, the
    * multi-query eval-harness form (macro-average is one aggregation
    * away). Queries with ZERO retrieved hits still appear (recall 0,
    * null MRR, NDCG 0) — a silent row drop would inflate every
    * average. All joins and folds run at list grain (≤ k rows per
    * query).
    */
  def vsTruthBy(ranked: DataFrame, truth: DataFrame, queryCol: String,
      itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val nT = truth.groupBy(col(queryCol).as("__q"))
      .agg(count(lit(1)).as("n_truth"))
    val hits = ranked
      .filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__it"),
        col(rankCol).as("__r"))
      .join(truth.select(col(queryCol).as("__q"),
        col(itemCol).as("__it")), Seq("__q", "__it"), "left_semi")
    hits
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("__nh"), min(col("__r")).as("__r1"),
        sort_array(collect_list(col("__r").cast("long"))).as("__rs"))
      .join(nT, Seq("__q"), "right")
      .select(col("__q").as(queryCol), col("n_truth"),
        coalesce(col("__nh"), lit(0L)).as("n_hit"),
        round(coalesce(col("__nh"), lit(0L)).cast("double")
          / col("n_truth"), 4).as("recall_at_k"),
        round(lit(1.0) / col("__r1"), 4).as("mrr"),
        round(
          expr("aggregate(coalesce(__rs, CAST(array() AS ARRAY<BIGINT>))" +
            ", 0.0D, (a, r) -> a + 1.0 / log2(r + 1.0))") /
          expr(s"aggregate(sequence(1L, CAST(least($k, " +
            "greatest(n_truth, 1L)) AS BIGINT)), 0.0D, " +
            "(a, i) -> a + 1.0 / log2(i + 1.0))"),
          4).as("ndcg_at_k"))
  }

  def vsTruth(ranked: DataFrame, truth: DataFrame, itemCol: String,
      rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val hits = ranked
      .filter(col(rankCol) <= k)
      .select(col(itemCol).as("__it"), col(rankCol).as("__r"))
      .join(truth.select(col(itemCol).as("__it")), Seq("__it"),
        "left_semi")
    val nTruth = broadcast(truth
      .agg(count(lit(1)).as("n_truth")))
    hits
      .agg(count(lit(1)).as("n_hit"),
        min(col("__r")).as("__r1"),
        sort_array(collect_list(col("__r"))).as("__rs"))
      .crossJoin(nTruth)
      .select(lit(k).as("k"), col("n_truth"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth"), 4)
          .as("recall_at_k"),
        round(lit(1.0) / col("__r1"), 4).as("mrr"),
        round(
          expr("aggregate(__rs, 0.0D, (a, r) -> " +
            "a + 1.0 / log2(r + 1.0))") /
          expr(s"aggregate(sequence(1L, CAST(least($k, " +
            "greatest(n_truth, 1L)) AS BIGINT)), 0.0D, " +
            "(a, i) -> a + 1.0 / log2(i + 1.0))"),
          4).as("ndcg_at_k"))
  }
}
