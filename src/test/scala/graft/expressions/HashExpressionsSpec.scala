package graft.expressions

import graft.functions.DedupFunctions
import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd splitmix64 expression: value parity with the JVM
  * implementation (interpreted AND generated paths), ANSI immunity, null
  * behavior, and the SQL surface.
  */
class HashExpressionsSpec extends SparkSpec {

  test("SplitMix64 matches the JVM splitmix64 on both eval paths") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val df = ids.toDF("id")
      .select(col("id"), HashExpressions.splitmix64(col("id")).as("h"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) === DedupFunctions.splitmix64(id), s"id=$id")
    }
  }

  test("SplitMix64 wraps under ANSI mode (no ARITHMETIC_OVERFLOW)") {
    // the mixing constants overflow any long product — a Column-level
    // fold would throw with spark.sql.ansi.enabled=true (the Spark 4
    // default); the expression emits raw Java, which wraps
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val out = spark.range(1000000, 1000100)
      .select(HashExpressions.splitmix64(col("id")).as("h"))
      .collect()
    assert(out.length === 100)
  }

  test("null input -> null output; non-long input rejected at analysis") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(7L), None).toDF("id")
      .select(HashExpressions.splitmix64(col("id")).as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    val err = intercept[Exception] {
      Seq("x").toDF("s").select(HashExpressions.splitmix64(col("s"))).collect()
    }
    assert(err.getMessage.contains("graft_splitmix64"))
  }

  test("graft_splitmix64 is callable from SQL via GraftExtensions") {
    val r = spark.sql("SELECT graft_splitmix64(42L) AS h").collect().head
    assert(r.getLong(0) === DedupFunctions.splitmix64(42L))
  }

  test("Fnv1a64 matches the JVM fnv1a64 on both eval paths, including " +
      "empty and non-ASCII strings; null -> null; SQL surface works") {
    val s = spark
    import s.implicits._
    val strs = Seq("", "a", "hello world", "für", "the quick brown fox")
    val got = strs.toDF("t")
      .select(col("t"), HashExpressions.fnv1a64(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { t =>
      assert(got(t) === DedupFunctions.fnv1a64(t), s"s=$t")
    }
    val rows = Seq(Option("x"), None).toDF("t")
      .select(HashExpressions.fnv1a64(col("t")).as("h")).collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    val err = intercept[Exception] {
      Seq(1L).toDF("z").select(HashExpressions.fnv1a64(col("z"))).collect()
    }
    assert(err.getMessage.contains("graft_fnv1a64"))
    val r = spark.sql("SELECT graft_fnv1a64('hello world') AS h")
      .collect().head
    assert(r.getLong(0) === DedupFunctions.fnv1a64("hello world"))
  }
}
