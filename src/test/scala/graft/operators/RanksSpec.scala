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

  test("ordered prefix scan == the unpartitioned running-sum window, " +
      "bit for bit: long and double sums, nulls skipped, index = " +
      "row_number; and the plan carries no Window at all") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map { i =>
      (i.toLong, if (i % 17 == 0) null else java.lang.Long.valueOf(i % 7),
        if (i % 13 == 0) null
        else java.lang.Double.valueOf(math.sin(i.toDouble) * 100))
    }
    val df = rows.toDF("k", "c", "v")
    val dev = Ranks.withOrderedPrefixScan(df, Seq(col("k")),
        Seq("c" -> "cum_c", "v" -> "cum_v"), idxCol = "i")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("cum_c"), r.getAs[Double]("cum_v"),
          r.getAs[Long]("i")))).toMap
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = df
      .withColumn("cum_c", sum(col("c")).over(w))
      .withColumn("cum_v", sum(col("v")).over(w))
      .withColumn("i", row_number().over(Window.orderBy(col("k")))
        .cast("long"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("cum_c"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("cum_v")),
          r.getAs[Long]("i")))).toMap
    assert(dev.size === 200)
    dev.foreach { case (k, (c, v, i)) =>
      val (wc, wv, wi) = win(k)
      assert(c === wc && i === wi, s"k=$k")
      assert(java.lang.Double.doubleToLongBits(v) === wv,
        s"k=$k float accumulation differs")
    }
    val plan = Ranks.withOrderedPrefixScan(df, Seq(col("k")),
      Seq("c" -> "cum_c"), idxCol = "i")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
