package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed-rank / closed-form NTILE device must agree row for
  * row with Spark's own `ntile` window (the semantics the DuckDB
  * oracles replay) across uneven totals, tie-heavy keys, and n >
  * total.
  */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  private def check(total: Int, n: Int): Unit = {
    // tie-heavy value column (v = id % 7) with the id tie-break — the
    // shape the rewritten queries rank on
    val df = (0 until total).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "v")
    val expected = df
      .withColumn("tile", ntile(n).over(
        Window.orderBy(col("v").desc, col("id"))))
      .select(col("id"), col("tile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranks.withGlobalNtile(df,
        Seq(col("v").desc, col("id")), n, "tile")
      .select(col("id"), col("tile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected, s"total=$total n=$n")
  }

  test("ntile closed form matches the window across shapes") {
    for (total <- Seq(1, 3, 9, 10, 11, 37, 100); n <- Seq(1, 4, 10))
      check(total, n)
  }

  test("n greater than total: each row gets its own tile") {
    check(3, 10)
  }

  test("global row number is the total-order rank") {
    val df = Seq((5L, "b"), (1L, "a"), (3L, "c")).toDF("id", "s")
    val out = Ranks.withGlobalRowNumber(df, Seq(col("id")), "rn")
      .select(col("id"), col("rn")).as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 3L -> 2L, 5L -> 3L))
  }
}
