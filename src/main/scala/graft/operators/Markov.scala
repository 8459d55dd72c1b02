package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov analysis of event streams — the transition
  * matrix behind next-event prediction, funnel leak diagnosis, and the
  * "where does a user session end up in the long run" readout.
  *
  * Scale shape: transitions come from ONE keyed window (lead) over the
  * event log — a single shuffle at (key) grain — and aggregate to the
  * |S|² transition table, which is CONFIG-BOUNDED (|S| = distinct
  * states, e.g. event types), broadcast-safe by construction. The
  * power iteration then runs entirely on that bounded table: k rounds
  * of join + aggregate over ≤ |S|² rows — the corpus is touched once,
  * like [[Clustering]]'s Lloyd iterations.
  *
  * Portability: probabilities are exact count ratios (identical
  * operands both engines); each power-iteration step rounds π to the
  * 1e-6 grid (the k-means grid precedent) so the k-step trajectory
  * replays across engines despite re-associated sums.
  */
object Markov {

  /** (from_state, to_state, n, p): within-key adjacent transitions in
    * (orderCol, tieCol) order; p = n / Σ_to n exact division. The last
    * event of each key has no successor and contributes nothing.
    */
  def transitionMatrix(events: DataFrame, keyCol: String,
      orderCol: String, tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_state"),
        col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val outTot = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(outTot, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("__tot")).as("p"))
  }

  /** k-step power iteration toward the stationary distribution π:
    * starts uniform over the FROM states, each round
    * π'(j) = Σ_i π(i)·p(i→j) rounded at 1e-6 (grid-pinned trajectory).
    * States without outgoing edges shed their mass (documented: an
    * absorbing-state chain needs the self-loop in the data, which an
    * event log's repeated states naturally provide). Everything runs
    * on the bounded transition table.
    */
  def stationaryDistribution(transitions: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    val states = transitions.select(col("from_state").as("state"))
      .distinct()
    val nStates = states.count()
    var pi = states.withColumn("pi",
      round(lit(1.0) / nStates.toDouble, 6))
    for (_ <- 1 to iters) {
      pi = pi.join(transitions, col("state") === col("from_state"))
        .groupBy(col("to_state"))
        .agg(round(sum(col("pi") * col("p")), 6).as("pi"))
        .select(col("to_state").as("state"), col("pi"))
    }
    pi
  }
}
