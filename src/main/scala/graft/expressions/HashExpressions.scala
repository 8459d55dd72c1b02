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

/** Native Catalyst expression for FNV-1a 64 over a string column — the
  * engine-independent string hash the MinHash/SimHash UDFs use
  * internally ([[graft.functions.DedupFunctions.fnv1a64]]), exposed as
  * a codegen'd scalar so per-gram hashing (DSIR feature bucketing runs
  * once per n-gram occurrence of the corpus) stays inside whole-stage
  * codegen instead of paying UDF boxing. Replayed in SQL by
  * [[graft.HashOracles]]'s `fnv` fragment (HUGEINT mod 2^64).
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fnv1a64 requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.DedupFunctions.fnv1a64(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      // UTF8String -> String pays one allocation per row; the loop then
      // matches DedupFunctions.fnv1a64 char-for-char (UTF-16 units)
      s"""
         |String $str = $s.toString();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $h ^= ($str.charAt($i) & 0xffffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object HashExpressions {
  /** Column API for [[SplitMix64]] over a long column. */
  def splitmix64(z: Column): Column =
    ColumnBridge.column(SplitMix64(ColumnBridge.expression(z)))

  /** Column API for [[Fnv1a64]] over a string column. */
  def fnv1a64(s: Column): Column =
    ColumnBridge.column(Fnv1a64(ColumnBridge.expression(s)))
}
