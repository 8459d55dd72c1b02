package graft.expressions

import graft.functions.{VectorFunctions => VF}
import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The native DotProduct expression: value parity with the higher-order
  * form, null handling, and SQL-surface registration via GraftExtensions.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("DotProduct matches the higher-order aggregate form bit-for-bit") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f), Seq(0.3f, 0.4f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("a", "b")
      .select(
        transform(col("a"), _.cast("double")).as("ad"),
        transform(col("b"), _.cast("double")).as("bd"))
    val rows = df.select(
      VectorExpressions.dotProduct(col("ad"), col("bd")).as("fast"),
      VF.dot(col("ad"), col("bd")).as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("DotProduct matches zip_with semantics on ragged and null-element arrays") {
    // ragged lengths: higher-order form null-pads the short side -> NULL
    val ragged = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D)) AS d").head()
    assert(ragged.isNullAt(0))
    // a null element poisons the sum in both forms
    val nullElem = spark.sql(
      "SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS d")
      .head()
    assert(nullElem.isNullAt(0))
    // the reference higher-order behavior, for the record
    val hof = spark.sql(
      """SELECT aggregate(zip_with(array(1.0D, 2.0D), array(3.0D),
        |  (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) AS d""".stripMargin)
      .head()
    assert(hof.isNullAt(0))
  }

  test("DotProduct is null-intolerant (null input -> null output)") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(
      VectorExpressions.dotProduct(col("a"), col("b")).as("d")).collect()
    assert(r.head.isNullAt(0))
  }

  test("optimizer rule rewrites the higher-order dot pattern to graft_dot") {
    // non-literal input so constant folding can't collapse the plan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val df = emb.select(VF.dot(col("v"), col("v")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate("), optimized)
    // bit-identical to the unrewritten form (squared L2 norm)
    val viaNorm = emb.select((VF.l2Norm(col("v")) * VF.l2Norm(col("v"))).as("d"))
    assert(df.head().getDouble(0) > 0.0)
    assert(math.abs(df.head().getDouble(0) - viaNorm.head().getDouble(0)) < 1e-9)
  }

  test("rewrite leaves non-matching aggregate patterns untouched") {
    val s = spark
    import s.implicits._
    // sum of squares: zip_with against ITSELF with addition seed 1.0 —
    // shape differs, must not be rewritten
    val df = Seq(Seq(2.0, 3.0)).toDF("a")
      .select(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), optimized)
    assert(df.head().getDouble(0) === 14.0)
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()
    assert(r.head.getDouble(0) === 11.0)
  }
}
