package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for scoring an `array<double>` vector
  * against a LITERAL matrix (trained centroids, deterministic
  * hyperplane lists): emits one `struct<score, index>` per matrix row,
  * in row order — exactly what the k-way
  * `array(struct(fold(v, lit(c_i)), i), ...)` Column constructor
  * builds, collapsed into ONE expression node.
  *
  * Two metrics, selected at construction:
  *  - `squaredL2 = true`: the [[graft.operators.Clustering]] assignment
  *    scorer — `Σ (x_i − c_i)²`, fields named `(dist, cid)`;
  *  - `squaredL2 = false`: the [[graft.operators.Similarity]] bestLists
  *    scorer — `Σ x_i · c_i`, fields named `(score, list_id)`.
  *
  * Why an Expression and not the Column fold: the fold materializes a
  * k-way expression tree whose every distance is an interpreted
  * higher-order `aggregate(zip_with(...))` — per row that is k
  * intermediate array allocations plus 2·k·dim boxed lambda dispatches,
  * and the k-way tree itself bloats analysis/codegen for every k-means
  * assignment, trained-list probe, and IVF query (k=64 call sites carry
  * ~4k literal leaves per operator). This node compiles to a primitive
  * double loop over a reference-held `double[][]`, inside whole-stage
  * codegen.
  *
  * Semantics are EXACTLY the fold's, including the degenerate rows:
  *   - the score accumulates left-to-right from 0.0 (bit-identical IEEE
  *     sums to `aggregate(zip_with(...))`);
  *   - a NULL input vector, a length mismatch against matrix row `c`,
  *     or any NULL element yields a NULL score for that row — but the
  *     ARRAY itself is never null (the `array(...)` constructor's
  *     semantics: struct rows with null scores, non-null ids), so
  *     downstream `array_sort`/tie-break behavior is unchanged
  *     row-for-row.
  *
  * The matrix is a `Seq[Seq[Double]]` constructor field (structural
  * equality — two plans over the same trained centroids canonicalize
  * equal, so self-join exchange reuse keeps firing), converted once to
  * `double[][]` for the hot loop.
  */
case class ScoredByMatrix(child: Expression, matrix: Seq[Seq[Double]],
    squaredL2: Boolean) extends UnaryExpression {

  require(matrix.nonEmpty, "matrix must be non-empty")

  @transient private lazy val m: Array[Array[Double]] =
    matrix.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got " +
        t.catalogString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField(if (squaredL2) "dist" else "score", DoubleType,
        nullable = true),
      StructField(if (squaredL2) "cid" else "list_id", IntegerType,
        nullable = false))),
    containsNull = false)

  // the array(...) constructor never returns null — struct rows carry
  // null scores instead (NULL/ragged input vectors still get a row per
  // matrix row, ties broken on the id downstream, exactly as before)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (squaredL2) "graft_l2_scored" else "graft_dot_scored"

  /** The whole per-row computation, shared verbatim by the interpreted
    * and generated paths. `v` may be null.
    */
  def compute(v: ArrayData): ArrayData = {
    val k = m.length
    val out = new Array[Any](k)
    if (v == null) {
      var c = 0
      while (c < k) {
        out(c) = new GenericInternalRow(Array[Any](null, c)); c += 1
      }
      return new GenericArrayData(out)
    }
    val n = v.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) {
      if (v.isNullAt(i)) hasNull = true
      i += 1
    }
    val x = if (hasNull) null else v.toDoubleArray()
    val l2 = squaredL2
    var c = 0
    while (c < k) {
      val row = m(c)
      if (hasNull || row.length != n) {
        out(c) = new GenericInternalRow(Array[Any](null, c))
      } else {
        var acc = 0.0
        var j = 0
        if (l2) {
          while (j < n) {
            val d = x(j) - row(j)
            acc += d * d
            j += 1
          }
        } else {
          while (j < n) {
            acc += x(j) * row(j)
            j += 1
          }
        }
        out(c) = new GenericInternalRow(Array[Any](acc, c))
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scoremat", this,
      classOf[ScoredByMatrix].getName)
    val childGen = child.genCode(ctx)
    val arrayData = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${childGen.code}
        $arrayData ${ev.value} = $ref.compute(
          ${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ScoredByMatrix = copy(child = newChild)
}

object MatrixDistances {
  /** Column API for the squared-L2 [[ScoredByMatrix]]:
    * `array<struct<dist: double, cid: int>>`, one entry per centroid.
    */
  def l2ScoredByMatrix(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(ScoredByMatrix(
      ColumnBridge.expression(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq, squaredL2 = true))

  /** Column API for the dot-product [[ScoredByMatrix]]:
    * `array<struct<score: double, list_id: int>>`, one entry per row.
    */
  def dotScoredByMatrix(v: Column, rows: Seq[Seq[Double]]): Column =
    ColumnBridge.column(ScoredByMatrix(
      ColumnBridge.expression(v),
      rows.map(_.toIndexedSeq).toIndexedSeq, squaredL2 = false))
}
