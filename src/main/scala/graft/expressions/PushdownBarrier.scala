package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that DECLARES itself non-deterministic so Catalyst
  * will not move, duplicate, or push a predicate built on it — while
  * evaluating (and code-generating) as exactly its child.
  *
  * Why it exists: predicate pushdown substitutes aliases into filter
  * conditions with no cost model. A filter on a computed column whose
  * defining expression is expensive AND multiply-shared (e.g.
  * `drop_reason`, built from a materialized token array) gets inlined
  * through the projections into one mega-predicate at the scan,
  * re-running the tokenization per rule — measured 22 s vs 1 s at sf0.1
  * ([[graft.operators.QualityFilters.keep]]). The previous fix was a
  * typed `Row => Boolean` filter, which does stop pushdown but
  * deserializes every row out of Tungsten and ends the whole-stage-
  * codegen span — per-row boxing that is noise at sf0.1 and real money
  * at 100 TB. Wrapping the filter condition in this barrier keeps the
  * stop-pushdown property (`PushPredicateThroughNonJoin` only moves
  * deterministic predicates) with zero evaluation cost: `doGenCode`
  * emits the child's code verbatim, so the filter stays inside the
  * codegen'd stage.
  *
  * The non-determinism is a declaration only — the value is a pure
  * function of the child. Consequences to be aware of: the optimizer
  * also refuses constant-folding through it (intended) and analysis
  * restricts it to Project/Filter/Aggregate positions (where filters
  * live anyway).
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "pushdown_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}

object PushdownBarrier {
  /** Column API: `barrier(c)` evaluates as `c` but predicates built on it
    * stay where the caller put them.
    */
  def barrier(c: Column): Column =
    ColumnBridge.column(PushdownBarrier(ColumnBridge.expression(c)))
}
