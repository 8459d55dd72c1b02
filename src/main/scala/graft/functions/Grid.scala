package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-exact grid snap — the portability device every replay fold
  * rounds through.
  *
  * The house replay discipline pins fold state to a decimal grid after
  * each step so a trajectory is a pure function of grid values and any
  * engine reproduces it. `round(x, 6)` is NOT that device: Spark rounds
  * the exact decimal expansion of the double (BigDecimal HALF_UP) while
  * DuckDB multiplies by 1e6 first and rounds the (inexact) product — on
  * half-ulp boundaries the two disagree by one grid ulp, and one early
  * disagreement propagates through a thousand-step fold.
  *
  * The snap is instead defined BY an IEEE-754 expression:
  *
  *   snap(x, d) = floor(x * 10^d + 0.5) / 10^d
  *
  * — one double multiply, one double add, floor, one double divide.
  * Every engine that evaluates doubles per IEEE 754 (Spark, DuckDB,
  * anything else) computes bit-identical results, because the
  * *definition* is the float program, not a decimal ideal. Semantics:
  * round-half-UP (toward +∞ — note, not away-from-zero for negatives);
  * that choice is part of the contract and is irrelevant to callers,
  * who only need determinism.
  *
  * Use [[snap]]/[[snapSql]] in the operator and the TEXTUALLY identical
  * [[snapSql]] in its DuckDB oracle; [[snapD]] is the same program for
  * driver-side folds (e.g. the Shapley subset enumeration).
  *
  * Domain: |x·10^d| must stay below 2^53 (grid exactness) and, on the
  * Spark side, below 2^63 (FLOOR on DOUBLE yields BIGINT) — every fold
  * state in this library is a bounded smoothed statistic, orders of
  * magnitude inside both.
  *
  * == The running-sum rule (round-12 sweep) ==
  *
  * NO ordered running sum over inexact doubles may sit upstream of a
  * hashed output. Ordering the window identically on both engines does
  * NOT make a float prefix sum portable: Spark's window sum is a
  * sequential left fold, DuckDB's is a pairwise SEGMENT TREE (judge-
  * proved in round 11: `sum(y) OVER (ROWS UNBOUNDED PRECEDING)` ≠
  * `list_reduce(ys, +)` in DuckDB at 100 elements already), and the
  * last-ulp drift survives any output snap. Portable alternatives, in
  * preference order:
  *
  *  1. **Exact scaled integers** — values on a declared decimal grid
  *     (cents, counts, the 1e-6 house grid) scale to longs/decimals
  *     via `floor(x·10^s + 0.5)` and the prefix/total sums run as
  *     integer arithmetic, which is associative and thus order- and
  *     tree-free. Every output double is then one cast + one division
  *     from exact integers. (changePoint, cusumDrift, cohortLtv,
  *     kaplanMeier's ln-factor sums, logRank's ΣE/ΣV, q40/q185.)
  *  2. **The per-step-snapped list fold** — collect the ordered series
  *     and fold with [[snapSql]] after each step in BOTH engines
  *     (`aggregate` in Spark SQL, `list_reduce` in DuckDB — the
  *     q251/q253 device) when the per-step state is genuinely
  *     fractional and no grid can be declared.
  *
  * Running sums over actual integer columns (session counters, risk
  * sets, token offsets) are exact and need no device.
  */
object Grid {

  private def pw(decimals: Int): String = s"1.0E$decimals"

  /** The snap as SQL text — the same string is valid, and numerically
    * identical, in Spark SQL and DuckDB. Embed in fold lambdas and in
    * oracle SQL so both engines run the same float program.
    */
  def snapSql(inner: String, decimals: Int = 6): String =
    s"CAST(FLOOR(($inner) * ${pw(decimals)} + 0.5) AS DOUBLE) / " +
      pw(decimals)

  /** Column-API snap (same program; FLOOR(DOUBLE) -> BIGINT -> DOUBLE
    * cast is exact below 2^53).
    */
  def snap(c: Column, decimals: Int = 6): Column = {
    val p = math.pow(10.0, decimals)
    floor(c * lit(p) + lit(0.5)).cast("double") / lit(p)
  }

  /** Driver-side snap — the identical IEEE ops in JVM doubles. */
  def snapD(x: Double, decimals: Int = 6): Double = {
    val p = math.pow(10.0, decimals)
    math.floor(x * p + 0.5) / p
  }

  /** A driver-computed double as ROUND-TRIPPING SQL text: 17
    * significant digits pin the exact IEEE value, and string→double
    * parsing is correctly rounded on any engine, so Spark and an
    * oracle embedding the same `lit17` literal start their folds from
    * the same bits — the portability contract for constants computed
    * in Scala (SPRT log-odds, EWMA limit factors).
    */
  def lit17(x: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.17e", Double.box(x))
    s"CAST('$s' AS DOUBLE)"
  }
}
