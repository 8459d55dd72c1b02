package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro–Winkler string similarity, shared by the interpreted and
  * generated paths of [[JaroWinkler]].
  *
  * Semantics are the CLASSIC Winkler definition (and byte-for-byte what
  * DuckDB's `jaro_winkler_similarity` computes, which is how the q144
  * oracle gates it):
  *   - if EITHER string is empty the score is 0.0 — including the
  *     both-empty case (this is the one spot where "equal strings → 1.0"
  *     does NOT apply);
  *   - match window is `max(|a|,|b|)/2 - 1` (floor, min 0);
  *   - transpositions are half the count of matched-but-misordered chars;
  *   - the Winkler prefix bonus `l * 0.1 * (1 - jaro)` (common prefix
  *     capped at 4) applies only when `jaro > 0.7` (the boost threshold).
  *
  * Comparison is per Java `char` (UTF-16 code unit): identical to DuckDB's
  * per-codepoint comparison for all BMP text, which covers every string in
  * this engine's tables. Scratch arrays are allocated per call — the
  * strings in linkage workloads are short (tens of chars), so these stay
  * in the TLAB; a thread-local would save nothing measurable and leak
  * capacity across the executor pool.
  */
object JaroWinklerImpl {

  /** Jaro similarity in [0,1]; 0.0 if either side is empty. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val half = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - half).toDouble / m) / 3.0
  }

  /** Jaro–Winkler: jaro plus the prefix bonus above the 0.7 boost
    * threshold. Static entry point for the generated code. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val ja = jaro(a, b)
    if (ja <= 0.7) return ja
    var l = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    ja + l * 0.1 * (1.0 - ja)
  }
}

/** Native Catalyst expression for Jaro–Winkler similarity of two string
  * columns.
  *
  * Why an Expression and not a UDF: fuzzy linkage evaluates this once per
  * CANDIDATE PAIR — the output of the blocking join, the widest point of
  * the linkage plan — so it must stay inside whole-stage codegen. A Scala
  * UDF at that spot pays UTF8String→String→boxing round trips per pair
  * and fences the generated stage; this expression is a single static
  * call from the generated code (the same shape as Spark's own
  * `levenshtein`, which delegates to `UTF8String.levenshteinDistance`).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires two string arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerImpl.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column API for [[JaroWinkler]] over two string columns. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
