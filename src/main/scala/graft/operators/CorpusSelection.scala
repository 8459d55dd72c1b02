package graft.operators

import graft.expressions.HashExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Token-budget-constrained corpus selection — "the best documents that
  * fit N tokens": keep documents in descending quality order until the
  * token budget is exhausted. The final training-mix step once quality
  * scores exist.
  *
  * A naive global sort + running sum is inherently sequential (one
  * window over the whole corpus). This implementation is the
  * scale-correct two-phase shape:
  *
  *  1. per-SCORE token totals (one partial-agg shuffle over a small
  *     integer score domain), cumulated driver-side — a few hundred
  *     rows of bookkeeping, like the stratum counts in
  *     [[Sampling.temperatureSample]];
  *  2. every bucket strictly better than the cutoff score is taken
  *     WHOLE (a plain filter — no ordering work at all); only the ONE
  *     boundary bucket is ranked, by `(splitmix64(id), id)` (stable,
  *     engine-independent — no preference among equal-quality docs, so
  *     the tie-break is the deterministic hash), with a running token
  *     sum deciding who fits the remaining budget.
  *
  * Only the boundary bucket pays a window, and it is a single score
  * partition — bounded by the score grid's resolution, not the corpus.
  * No partial documents: a doc either fits the remainder or is dropped.
  */
object CorpusSelection {

  /** Rows of `df` selected under `budget` total tokens. `scoreCol` must
    * be integer-grid (e.g. [[graft.functions.TextFunctions.qualityScore]]),
    * `tokenCountCol` a per-row token count. Rows with a NULL score or
    * token count are never selected (they cannot be budgeted or ranked —
    * at the input they signal null text, which a quality stage upstream
    * should have dropped already).
    *
    * The input is referenced three times (totals action, full-bucket
    * filter, boundary window), so it is persisted for the duration of
    * the call with ownership registered to the active
    * [[graft.CacheScope]] — the same contract as `Dedup.dedupCorpus`;
    * when `df` is itself a pipeline, re-running it per reference is the
    * operator-cost class measured at 10× on dedupCorpus.
    */
  def selectByTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokenCountCol: String, budget: Long,
      maxScoreBuckets: Int = 100000): DataFrame = {
    require(budget >= 0, s"bad budget $budget")
    // the driver-side cumulation is safe ONLY while scoreCol is a small
    // integer grid: enforce both halves loudly. (1) an integral type —
    // a continuous double score would both collect one row per distinct
    // value and mis-bucket under the long conversion below; (2) a
    // cardinality cap — collect one row MORE than the cap so the
    // overflow is detected without ever pulling an unbounded result to
    // the driver.
    val scoreType = df.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(scoreType),
      s"scoreCol '$scoreCol' must be an integer-grid column (small, " +
        s"countable score domain); got $scoreType — bucket or round the " +
        "score to integers first")
    val base = graft.CacheScope.register(
      df.filter(col(scoreCol).isNotNull && col(tokenCountCol).isNotNull)
        .persist())
    val collected = base.groupBy(col(scoreCol))
      .agg(sum(col(tokenCountCol).cast("long")).as("t"))
      .limit(maxScoreBuckets + 1)
      .collect()
    require(collected.length <= maxScoreBuckets,
      s"scoreCol '$scoreCol' has more than $maxScoreBuckets distinct " +
        "values - the per-score cumulation is driver-side bookkeeping " +
        "and only sound over a small score grid")
    val totals = collected
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1))
      .sortBy(-_._1)
    var acc = 0L
    var cutoff: Option[Long] = None
    var remaining = 0L
    totals.foreach { case (s, t) =>
      if (cutoff.isEmpty) {
        if (acc + t <= budget) acc += t
        else { cutoff = Some(s); remaining = budget - acc }
      }
    }
    cutoff match {
      case None => base // everything fits
      case Some(c) =>
        val full = base.filter(col(scoreCol) > c)
        val w = Window.partitionBy(col(scoreCol))
          .orderBy(HashExpressions.splitmix64(col(idCol).cast("long")),
            col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundary = base.filter(col(scoreCol) === c)
          .withColumn("__cum",
            sum(col(tokenCountCol).cast("long")).over(w))
          .filter(col("__cum") <= remaining)
          .drop("__cum")
        full.unionByName(boundary)
    }
  }
}
