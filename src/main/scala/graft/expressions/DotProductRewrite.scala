package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the declarative dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] expression. Users (and
  * `VectorFunctions.dot`) write the readable higher-order form; plans
  * execute the primitive-loop form — the Catalyst-native way to optimize
  * a hot scalar pattern without changing any call site. Registered via
  * `GraftExtensions` (`spark.sql.extensions`).
  *
  * The match is deliberately conservative: exact shape, double element
  * types, literal 0.0 seed, identity finish — anything else is left
  * untouched (bit-identical results are guaranteed because DotProduct
  * uses the same left-fold accumulation order).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isMulOfVars(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isSqDiffOfVars(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(
          Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
          Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x1.exprId == a.exprId && y1.exprId == b.exprId &&
        x2.exprId == a.exprId && y2.exprId == b.exprId
    case _ => false
  }

  private def isAddOfVars(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      x.exprId == a.exprId
    case _ => false
  }

  // pattern-guard BOTH sides: the old form checked only left's type and
  // asInstanceOf-cast right's, which would throw ClassCastException
  // inside the optimizer for a non-array right child instead of
  // skipping the rewrite (safe today only because resolved ZipWith
  // guarantees array inputs — don't rely on it)
  private def isDoubleArrays(left: Expression, right: Expression): Boolean =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(DoubleType, _),
            org.apache.spark.sql.types.ArrayType(DoubleType, _)) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right, mul: LambdaFunction),
            Literal(0.0, DoubleType),
            add: LambdaFunction,
            finish: LambdaFunction)
          if isMulOfVars(mul) && isAddOfVars(add) && isIdentity(finish) &&
            isDoubleArrays(left, right) =>
        DotProduct(left, right)
      case ArrayAggregate(
            ZipWith(left, right, sq: LambdaFunction),
            Literal(0.0, DoubleType),
            add: LambdaFunction,
            finish: LambdaFunction)
          if isSqDiffOfVars(sq) && isAddOfVars(add) && isIdentity(finish) &&
            isDoubleArrays(left, right) =>
        L2DistanceSq(left, right)
    }
}
