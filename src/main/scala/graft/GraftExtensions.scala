package graft

import graft.expressions.{DotProduct, DotProductRewrite, Fnv1a64, JaroWinkler, SplitMix64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions (`spark.sql("SELECT graft_dot(a, b)")`)
  * and the [[DotProductRewrite]] optimizer rule that turns the
  * higher-order dot-product pattern into the codegen'd expression.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * idiomatic extension hook for a Spark-native library (no session
  * patching, works under Connect's classic mode and spark-submit alike).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_splitmix64"),
      new ExpressionInfo(classOf[SplitMix64].getName, "graft_splitmix64"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_splitmix64 takes exactly 1 argument")
        SplitMix64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "graft_fnv1a64"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_fnv1a64 takes exactly 1 argument")
        Fnv1a64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
