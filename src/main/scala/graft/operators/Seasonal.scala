package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical seasonal decomposition and lagged cross-correlation —
  * the descriptive time-series pair the forecasting family
  * ([[Forecast]], [[Robust.changePoint]]) reads its diagnostics from.
  *
  * Everything here is KEYED window + aggregation algebra (no fold, no
  * driver state): series keys process in parallel, windows partition
  * by key, and the calendar-true `t` grid means gappy series degrade
  * gracefully (a missing day shrinks its trend window instead of
  * shifting phase — the [[Forecast.holtWinters]] slot convention).
  */
object Seasonal {

  /** Additive decomposition (the moving-average classic, Hyndman &
    * Athanasopoulos §6.2 shape): per key, `trend_t` = the RANGE-window
    * mean of `y` over `t ± period/2` (calendar units, so gaps shrink
    * the window), detrended `d = y − trend`, and the seasonal index of
    * slot `c = t mod period` is the mean of that slot's detrended
    * values. Returns one row per (key, slot): `(key, slot, n_obs,
    * seasonal)` — the register a seasonal-naive baseline or a
    * holt–winters INIT reads. Not centered: the indexes absorb any
    * residual level the finite window leaves (center downstream if a
    * sum-zero register is needed).
    *
    * Replay discipline: `scale` declares the input's decimal grid
    * (2 for currency, 0 for counts). The trend window then sums EXACT
    * scaled longs — order-free, unlike a float window avg, whose
    * accumulation order (sequential re-scan in Spark, segment tree in
    * DuckDB) differs — and the trend is ONE exact-int division,
    * engine-identical bit for bit. Values must sit on the declared
    * grid (the house grid contract; `floor(y·10^s + 0.5)` is the
    * engine-exact scaler).
    */
  def decompose(df: DataFrame, keyCol: String, tCol: String,
      valueCol: String, period: Int, scale: Int = 2): DataFrame = {
    require(period >= 2 && period <= 1000, s"bad period $period")
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val h = period / 2
    val p = math.pow(10.0, scale)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).cast("long")).rangeBetween(-h, h)
    df.filter(col(tCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__sc",
        floor(col(valueCol).cast("double") * p + 0.5).cast("long"))
      .withColumn("__trend", Grid.snap(
        sum(col("__sc")).over(w).cast("double") /
          (lit(p) * count(lit(1)).over(w))))
      .withColumn("__d", col(valueCol).cast("double") - col("__trend"))
      .groupBy(col(keyCol),
        pmod(col(tCol).cast("long"), lit(period.toLong)).as("slot"))
      .agg(count(lit(1)).as("n_obs"),
        Grid.snap(avg(col("__d")), 4).as("seasonal"))
  }

  /** Per-POINT residuals of the additive decomposition — what
    * [[decompose]] aggregates away: `resid_t = (y_t − trend_t) −
    * seasonal(t mod period)`, the series Twitter's seasonal-hybrid
    * ESD runs its robust outlier test on (deseasonalized, detrended
    * anomalies — a spike on a naturally-big weekday is NOT an
    * anomaly; a normal value on a quiet slot may be). Same trend
    * window, same exact-cent sums, same snapped register as
    * [[decompose]] — the register is recomputed from the identical
    * expressions, so residuals(df).groupBy(slot) reconciles with
    * decompose(df) exactly.
    *
    * Output: (key, t, value, trend, seasonal, resid) — trend on the
    * 1e-6 grid, seasonal and resid on the 1e-4 grid.
    */
  def residuals(df: DataFrame, keyCol: String, tCol: String,
      valueCol: String, period: Int, scale: Int = 2): DataFrame = {
    require(period >= 2 && period <= 1000, s"bad period $period")
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val h = period / 2
    val p = math.pow(10.0, scale)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).cast("long")).rangeBetween(-h, h)
    // the detrended table feeds the register AND the join back — pin
    // it so the range-window trend computes once
    val base = graft.CacheScope.register(df
      .filter(col(tCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__sc",
        floor(col(valueCol).cast("double") * p + 0.5).cast("long"))
      .withColumn("__trend", Grid.snap(
        sum(col("__sc")).over(w).cast("double") /
          (lit(p) * count(lit(1)).over(w))))
      .withColumn("__d", col(valueCol).cast("double") - col("__trend"))
      .withColumn("__slot",
        pmod(col(tCol).cast("long"), lit(period.toLong)))
      .persist())
    val seas = base.groupBy(col(keyCol), col("__slot"))
      .agg(Grid.snap(avg(col("__d")), 4).as("seasonal"))
    base.join(seas, Seq(keyCol, "__slot"))
      .select(col(keyCol), col(tCol), col(valueCol),
        col("__trend").as("trend"), col("seasonal"),
        Grid.snap(col("__d") - col("seasonal"), 4).as("resid"))
  }

  /** Lagged cross-correlation between two series sharing a time grid:
    * `ccf(k) = corr(x_{t−k}, y_t)` for `k = 0..maxLag` — does x LEAD
    * y (a peak at positive k means x's values show up in y k steps
    * later)? One self-join per lag on the bounded lag list; Pearson
    * corr from explicit sums (exact where the inputs are integral).
    * Rows pair only where both series observe (inner join — gappy
    * days drop from that lag's n). Returns `(lag, n, ccf)`.
    */
  /** `scale` declares the decimal grid as in [[decompose]]: the five
    * Pearson sums accumulate EXACT scaled longs (order-free), convert
    * once to double (correctly rounded — deterministic), and the corr
    * formula is a fixed expression tree — engine-identical end to
    * end. Σ(x·10^s)² must fit a long: fine for any bounded series
    * (10⁶ points of 10⁷-cent values sit at ~10²⁰/10⁴ = 10¹⁶ ≪ 2⁶³).
    */
  def crossCorrelation(df: DataFrame, tCol: String, xCol: String,
      yCol: String, maxLag: Int, scale: Int = 2): DataFrame = {
    require(maxLag >= 0 && maxLag <= 64, s"bad maxLag $maxLag")
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val x = df.select(col(tCol).cast("long").as("__t"),
      floor(col(xCol).cast("double") * p + 0.5).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val y = df.select(col(tCol).cast("long").as("__t"),
      floor(col(yCol).cast("double") * p + 0.5).cast("long").as("__y"))
      .filter(col("__y").isNotNull)
    val parts = (0 to maxLag).map { k =>
      // pair x_{t−k} with y_t: shifting X forward by k makes a
      // positive-lag peak read "x LEADS y by k"
      x.withColumn("__t", col("__t") + k).join(y, Seq("__t"))
        .agg(count(lit(1)).as("n"),
          sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
          sum(col("__x") * col("__x")).as("sxx"),
          sum(col("__y") * col("__y")).as("syy"),
          sum(col("__x") * col("__y")).as("sxy"))
        .select(lit(k).as("lag"), col("n"),
          Grid.snap(
            // zero variance on a side leaves the corr undefined —
            // null, never an ANSI overflow snapping ±Inf/NaN
            when(col("n") >= 2 &&
              col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")
                =!= 0.0 &&
              col("n") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double")
                =!= 0.0,
              (col("n") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                sqrt((col("n") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double")) *
                  (col("n") * col("syy").cast("double") -
                    col("sy").cast("double") *
                      col("sy").cast("double")))),
            4).as("ccf"))
    }
    parts.reduce(_ unionByName _)
  }
}
