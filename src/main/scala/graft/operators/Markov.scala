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
    * π'(j) = Σ_i π(i)·p(i→j) snapped to the 1e-6 grid (the engine-
    * exact [[graft.functions.Grid]] device — grid-pinned trajectory).
    * States without outgoing edges shed their mass (documented: an
    * absorbing-state chain needs the self-loop in the data, which an
    * event log's repeated states naturally provide).
    *
    * Execution: the transition table is |S|²-bounded BY CONSTRUCTION
    * (it aggregates to distinct state pairs), so the iterations run
    * DRIVER-SIDE over the collected table — the kmeansCentroids /
    * Bradley–Terry discipline: iterating k dataset joins over ≤ |S|²
    * rows pays k shuffle stages of pure scheduling overhead for a
    * config-scale fact (measured 1.6 s → ~0.2 s at sf0.1). The bound
    * is CHECKED distributively before the collect (`maxStates`,
    * default 4096 → at most ~16M edge rows, and real event vocabular-
    * ies are orders smaller; a genuinely larger bounded table raises
    * the parameter EXPLICITLY, buying the memory knowingly). Per-step
    * sums fold in ASCENDING from_state order, seeded at 0.0 — the
    * identical left fold the DuckDB oracle runs as
    * `list_reduce(list_prepend(0.0, list(π·p ORDER BY from_state)))`,
    * so the k-step trajectory replays bit-exactly on any engine.
    *
    * STRING-STATE CONTRACT: the fold needs a total order shared with
    * the SQL mirror, so `from_state`/`to_state` must already be
    * StringType (event-type states are strings naturally); non-string
    * states fail loudly here rather than having their output type
    * silently rewritten. Ordering caveat: the driver sorts by Java
    * UTF-16 code units while a SQL engine may sort by UTF-8 binary
    * collation — identical for ASCII names (the practical event-
    * vocabulary case), divergent only when supplementary-plane
    * characters mix with U+E000..U+FFFF; keep state names ASCII when
    * an oracle must replay the trajectory.
    */
  def stationaryDistribution(transitions: DataFrame, iters: Int,
      maxStates: Int = 4096): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    Seq("from_state", "to_state").foreach { c =>
      val dt = transitions.schema(c).dataType
      require(dt == org.apache.spark.sql.types.StringType,
        s"$c is $dt — stationaryDistribution's fold contract is " +
          "string states (cast explicitly at the call site if the " +
          "states are genuinely string-like)")
    }
    val spark = transitions.sparkSession
    import spark.implicits._
    import graft.functions.Grid.snapD
    // bound checked distributively BEFORE the collect (house rule)
    val nStates = transitions.select(col("from_state")).distinct().count()
    require(nStates <= maxStates,
      s"$nStates states exceed maxStates=$maxStates — not a bounded " +
        "transition table; raise the bound only with a memory budget")
    val edges = transitions
      .select(col("from_state"), col("to_state"),
        col("p").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // incoming edges per target, ascending from_state — THE fold order
    val byTo = edges.groupBy(_._2).map { case (to, es) =>
      to -> es.map(e => (e._1, e._3)).sortBy(_._1)
    }
    val fromStates = edges.map(_._1).distinct.sorted
    var pi: Map[String, Double] =
      fromStates.map(_ -> snapD(1.0 / fromStates.length)).toMap
    for (_ <- 1 to iters) {
      pi = byTo.flatMap { case (to, ins) =>
        val present = ins.filter { case (from, _) => pi.contains(from) }
        if (present.isEmpty) None
        else {
          var a = 0.0
          present.foreach { case (from, p) => a += pi(from) * p }
          Some(to -> snapD(a))
        }
      }
    }
    pi.toSeq.sortBy(_._1).toDF("state", "pi")
  }
}
