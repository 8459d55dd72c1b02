package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for splitmix64 over a long column — the
  * engine-independent hash behind deterministic sampling, MinHash seeds,
  * and the LSH hyperplanes ([[graft.functions.DedupFunctions.splitmix64]];
  * replayed in SQL by [[graft.HashOracles]]).
  *
  * Why an Expression and not a UDF: the sampling filters run once per
  * corpus row, and a UDF both breaks whole-stage codegen and pays
  * boxing per call. Why not a Column arithmetic fold: Spark 4 runs ANSI
  * mode by default, where `Column * Column` on longs THROWS on the
  * overflow a mixing hash depends on. Generated Java (like the JVM
  * implementation) wraps silently — this expression is immune to the
  * ANSI setting by construction.
  */
case class SplitMix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_splitmix64 requires a bigint argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_splitmix64"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.DedupFunctions.splitmix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, z0 => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $z0 + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

object HashExpressions {
  /** Column API for [[SplitMix64]] over a long column. */
  def splitmix64(z: Column): Column =
    ColumnBridge.column(SplitMix64(ColumnBridge.expression(z)))
}
