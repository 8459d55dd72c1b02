package graft.functions

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The grid snap is one float program, evaluated identically in three
  * places: Spark SQL text ([[Grid.snapSql]]), the Column API
  * ([[Grid.snap]]), and driver-side JVM doubles ([[Grid.snapD]]). These
  * laws pin that — especially on the half-ulp boundary values where
  * `round(x, 6)` is engine-dependent (the q253/q254 failure class).
  * The cross-engine half (same program in DuckDB) is exercised by the
  * driver gate on every snapped fold oracle.
  */
class GridSpec extends SparkSpec {

  // Boundary battery: values whose *1e6 product sits within one ulp of
  // a .5 tie (where BigDecimal-HALF_UP and multiply-then-round split),
  // plus negatives, zeros, and ordinary magnitudes.
  private val battery: Seq[Double] = Seq(
    0.0, -0.0, 1.0, -1.0, 42.1234565, -42.1234565, 0.0000005,
    -0.0000005, 1.0000005, 2.0000005, 123456.7890115, -123456.7890115,
    0.3774265, 0.37742650000000004, 0.3774264999999999, 8.3333335,
    -8.3333335, 999.9999995, 1e-7, -1e-7, 12345.000000499999,
    12345.0000005000001)

  test("snapSql, snap(Column) and snapD agree bit-exactly on the " +
      "boundary battery") {
    val s = spark
    import s.implicits._
    val df = battery.toDF("x")
    val rows = df
      .select(col("x"), Grid.snap(col("x")).as("c"),
        expr(Grid.snapSql("x")).as("t"))
      .collect()
    rows.foreach { r =>
      val x = r.getDouble(0)
      val viaColumn = r.getDouble(1)
      val viaSqlText = r.getDouble(2)
      val viaDriver = Grid.snapD(x)
      assert(java.lang.Double.doubleToLongBits(viaColumn) ===
        java.lang.Double.doubleToLongBits(viaSqlText),
        s"Column vs SQL-text snap diverged at $x")
      assert(java.lang.Double.doubleToLongBits(viaColumn) ===
        java.lang.Double.doubleToLongBits(viaDriver),
        s"Spark vs driver snap diverged at $x")
    }
  }

  test("snap is idempotent and lands on the 1e-6 grid") {
    battery.foreach { x =>
      val y = Grid.snapD(x)
      assert(Grid.snapD(y) === y, s"not idempotent at $x")
      assert(math.abs(y * 1e6 - math.rint(y * 1e6)) < 1e-3,
        s"off-grid at $x -> $y")
      assert(math.abs(y - x) <= 5.0000001e-7 + math.ulp(x),
        s"moved more than half a grid cell at $x -> $y")
    }
  }

  test("the snap is decided by the IEEE product, unlike round(x, 6): " +
      "a value whose exact decimal is below the tie but whose double " +
      "product hits it rounds UP under the snap — deterministically") {
    // The double nearest 861.4255495 has exact decimal expansion just
    // BELOW the .5 tie (BigDecimal HALF_UP — Spark's round() — gives
    // 861.425549), but its double product x*1e6 computes to exactly
    // 861425549.5, so a multiply-then-round engine (DuckDB's round())
    // goes UP — the q253/q254 divergence class. The snap takes the
    // product branch by definition, so every IEEE engine agrees.
    val x = 861.4255495
    assert(x * 1e6 === 861425549.5)
    // the EXACT binary expansion (java.math.BigDecimal(double) — what
    // an exact-decimal rounder sees; note Scala's BigDecimal(double)
    // is valueOf/shortest-repr, which is a third, different answer)
    assert(BigDecimal(new java.math.BigDecimal(x)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble === 861.425549,
      "premise: an exact-decimal HALF_UP rounder takes this DOWN")
    assert(Grid.snapD(x) === 861.42555)
    val viaSpark = spark.range(1).select(
      expr(Grid.snapSql(x.toString)).as("y")).head().getDouble(0)
    assert(viaSpark === 861.42555)
  }

  test("snapD at other grids: cents (2) and the 1e-4 stats grid") {
    assert(Grid.snapD(10.005, 2) === 10.01 ||
      Grid.snapD(10.005, 2) === 10.0) // whichever the double product says
    assert(Grid.snapD(Grid.snapD(3.14159265, 4), 4) ===
      Grid.snapD(3.14159265, 4))
    assert(Grid.snapD(1.23449999, 4) === 1.2345 ||
      Grid.snapD(1.23449999, 4) === 1.2344)
    // exact grid values are fixed points at every scale
    Seq(0.01, 123.45, -7.89).foreach { v =>
      assert(Grid.snapD(v, 2) === v)
    }
  }
}
