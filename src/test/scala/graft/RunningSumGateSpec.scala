package graft

import graft.ingest.SparkSpec

/** The running-sum rule ([[graft.functions.Grid]] scaladoc, round-12
  * sweep), made self-enforcing: NO ordered running sum over inexact
  * doubles may sit upstream of a hashed output. Ordering identically
  * on both engines does NOT make a float prefix sum portable — Spark's
  * window sum is a sequential left fold, DuckDB's a pairwise segment
  * tree (judge-proved in round 11, the q254 red), and the last-ulp
  * drift survives any output snap.
  *
  * Two sides, each red on a silent reintroduction:
  *
  *  1. PLAN side (type-precise): no query's OPTIMIZED plan may carry a
  *     window Sum/Average over a Double/Float child with an ordered,
  *     non-full frame. Exact devices pass by construction: scaled
  *     longs/decimals (changePoint, cohortLtv), grid-integer ln
  *     factors (kaplanMeier), and order-free functions (min/max/
  *     row_number/first) are untouched.
  *  2. ORACLE side (textual): every oracleSql entry whose text uses a
  *     bounded/running ROWS frame must be whitelisted here with its
  *     integer-summand justification, and the whitelist must match the
  *     observed set EXACTLY — a new running-frame oracle fails until
  *     its author consciously records why its summands are exact.
  */
class RunningSumGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("PLAN GATE: no ordered running window Sum/Average over " +
      "Double/Float in any query's optimized plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.catalyst.expressions.{
      SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding,
      WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      AggregateExpression, Average, Sum}
    import org.apache.spark.sql.types.{DoubleType, FloatType}

    def fractional(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == DoubleType || dt == FloatType

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try CacheScope.scoped {
          val lp = fn(spark, dir).queryExecution.optimizedPlan
          lp.collect { case w: LWindow =>
            w.windowExpressions.flatMap(_.collect {
              case we: WindowExpression =>
                val spec = we.windowSpec
                // a frame that is NOT the full partition is
                // order-dependent (prefix, suffix, or sliding)
                val running = spec.frameSpecification match {
                  case SpecifiedWindowFrame(_, lo, up) =>
                    !(lo == UnboundedPreceding && up == UnboundedFollowing)
                  case _ => spec.orderSpec.nonEmpty
                }
                val badFn = we.windowFunction match {
                  case ae: AggregateExpression =>
                    ae.aggregateFunction match {
                      case s: Sum => fractional(s.child.dataType)
                      case a: Average => fractional(a.child.dataType)
                      case _ => false
                    }
                  case _ => false
                }
                if (spec.orderSpec.nonEmpty && running && badFn)
                  Seq(s"$name: ${we.windowFunction.sql}")
                else Nil
            }.flatten)
          }.flatten
        } catch { case _: Throwable => Nil } // plan errors fail elsewhere
    }
    assert(offenders.isEmpty,
      "float running sums crept back in (use the exact scaled-integer " +
        "device or the per-step-snapped fold — Grid.scala scaladoc):\n" +
        offenders.mkString("\n"))
  }

  /** Every oracle with a running/bounded ROWS frame, with WHY its
    * summands are exact. Keys must match the observed set exactly.
    */
  private val oracleWhitelist: Map[String, String] = Map(
    "q104_ccnet_selection" -> "token counts (integer)",
    "q107_epoch_mixture" -> "grid-contract weights (Mixture scaladoc)",
    "q112_topic_balanced_mix" -> "token counts (integer)",
    "q125_sequence_packing" -> "token lengths (integer)",
    "q131_select_and_pack" -> "token lengths (integer)",
    "q132_packed_payloads" -> "token lengths (integer)",
    "q133_grouped_packing" -> "token lengths (integer)",
    "q156_scd2_intervals" -> "row/interval counters (integer)",
    "q177_rate_anomalies" -> "bounded N-PRECEDING over event counts",
    "q181_weighted_median" -> "w = len(toks), integer",
    "q183_cusum_drift" -> "exact scaled-integer prefix (Robust)",
    "q185_pareto_revenue" -> "exact cents (HUGEINT)",
    "q187_bounce_rate" -> "session counters (integer)",
    "q192_matched_controls" -> "pair counts (integer)",
    "q193_dedup_yield" -> "doc counts (integer)",
    "q194_session_funnel" -> "session counters (integer)",
    "q197_kaplan_meier" -> "integer removals + 1e-9-grid ln factors",
    "q200_rag_context" -> "token counts (integer)",
    "q203_session_lm_anomaly" -> "token counts (integer)",
    "q204_gains_deciles" -> "label counts (integer)",
    "q221_logrank" -> "integer removals + 1e-9-grid E/V terms",
    "q233_weighted_median_sketch" -> "integer weights",
    "q254_changepoint" -> "exact cents (HUGEINT prefix)",
    "q265_sessionization" -> "gap counters (integer)",
    "q269_isotonic_calibration" -> "label/total counts (integer)",
    "q275_voptimal_histogram" -> "scaled-integer prefix moments",
    "q277_ks_test" -> "ca/cb counts (integer)",
    "q282_session_conversion" -> "session counters (integer)",
    "q285_cohort_ltv" -> "exact cents",
    "q288_woe_numeric" -> "bin label counts (integer)",
    "q292_burst_detection" -> "bounded N-PRECEDING over counts",
    "q318_changepoint_users" -> "exact integer counts (HUGEINT prefix)",
    "q322_language_budget_mix" -> "token counts (integer)",
    "q327_corpus_pipeline_multilingual" ->
      "token counts (integer, the q322 chain over survivors)",
    "q349_corpus_pipeline_langid" ->
      "token counts (integer, the q322 chain keyed by predicted lang)",
    "q357_char_coverage" -> "char counts (integer prefix sum)",
    "q34_session_window" -> "gap counters (integer)",
    "q40_running_sum" -> "exact cents",
    "q48_token_packing" -> "token lengths (integer)",
    "q49_first_last" -> "frame carries first/last, not sums",
    "q79_token_budget" -> "token counts (integer)",
    "q374_unimax" ->
      "integer token capacities x4, unit weights (Mixture scaladoc)",
    "q91_mixture_waterfill" -> "grid-contract weights (Mixture scaladoc)",
    "q96_waterfill_selection" -> "grid-contract weights (Mixture scaladoc)",
    "q99_corpus_pipeline_v4" -> "token counts (integer)")

  test("ORACLE GATE: running/bounded ROWS frames in oracle SQL match " +
      "the integer-summand whitelist exactly") {
    val fwd = ("(?i)ROWS\\s+(BETWEEN\\s+)?UNBOUNDED\\s+PRECEDING").r
    val rev = ("(?i)ROWS\\s+BETWEEN\\s+CURRENT\\s+ROW\\s+AND\\s+" +
      "UNBOUNDED\\s+FOLLOWING|(?i)ROWS\\s+BETWEEN\\s+\\d+\\s+PRECEDING").r
    val observed = SparkEntry.oracleSql.collect {
      case (name, sql) if fwd.findFirstIn(sql).isDefined ||
        rev.findFirstIn(sql).isDefined => name
    }.toSet
    val unlisted = observed -- oracleWhitelist.keySet
    val stale = oracleWhitelist.keySet -- observed
    assert(unlisted.isEmpty,
      "NEW running-frame oracle(s) — prove the summands are exact " +
        "integers/grid values and whitelist them here: " +
        unlisted.toSeq.sorted.mkString(", "))
    assert(stale.isEmpty,
      "stale whitelist entries (oracle no longer has a running " +
        "frame — prune): " + stale.toSeq.sorted.mkString(", "))
  }
}
