package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Correlogram — the standard autocorrelation estimator plus the
    * Ljung–Box (1978) portmanteau: `r_k = ĉ_k/ĉ_0` with
    * `ĉ_k = (1/n)Σ(y_t−ȳ)(y_{t+k}−ȳ)` (fixed full-series mean and a
    * fixed `1/n` normalizer — NOT [[crossCorrelation]]'s per-lag
    * Pearson, which re-centers per lag), and
    * `Q_k = n(n+2)Σ_{j≤k} r_j²/(n−j)` against χ²(k). The
    * is-this-white-noise gate a forecasting residual audit runs
    * before trusting [[graft.operators.Forecast]] backtests.
    *
    * Exactness: `y` scales to longs (`scale` grid), and the centered
    * numerator is carried ×n² so it stays INTEGER:
    * `n²·num_k = n²·P_k − n·S·(A_k+B_k) + (n−k)·S²` with
    * `P_k = Σ y_t·y_{t+k}`, `A_k/B_k` the pair-wise marginal sums —
    * all DECIMAL(38,0) (bound: n·S² must sit under 1e38; a 10⁶-point
    * series of 10⁹-scaled values uses ~10³⁰). `r_k` is one exact
    * decimal-to-double ratio, snapped at 6; `Q_k` folds the SNAPPED
    * grid r's in lag order (bounded list, fixed association), snapped
    * at 4 and null at lag 0.
    *
    * Plan shape: the series is positioned once (the distributed
    * sort-rank device — contract: one row per `tCol`, the caller's
    * aggregation grain), the lag list explodes each row `maxLag+1`
    * ways (a bounded blow-up of the already-aggregated series, never
    * of the corpus), and ONE position equi-join + one lag-grain
    * aggregation produce the bounded lag table everything else folds
    * over. Returns `(lag, n_pairs, acf, q_lb)` for `lag = 0..maxLag`.
    */
  def autocorrelation(df: DataFrame, tCol: String, yCol: String,
      maxLag: Int, scale: Int = 2): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"bad maxLag $maxLag")
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val series = df.select(col(tCol).as("__t"),
      floor(col(yCol).cast("double") * p + 0.5).cast("long")
        .as("__y"))
      .filter(col("__y").isNotNull)
    val idx = Ranks.withGlobalRowNumber(series, Seq(col("__t")),
      "__rn").select(col("__rn"), col("__y"))
    val tot = idx.agg(count(lit(1)).as("__n"),
      sum(col("__y").cast("decimal(38,0)")).as("__S"))
    val left = idx
      .select(col("__rn"), col("__y"),
        explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"))
      .withColumn("__tgt", col("__rn") + col("lag"))
    // PINNED: the bounded lag table feeds three branches (the lag-0
    // numerator, the r table, the Q fold) — uncached each would
    // re-run the position join and lag aggregation
    val perLag = graft.CacheScope.register(left
      .join(idx.select(col("__rn").as("__tgt"),
        col("__y").as("__y2")), Seq("__tgt"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__y").cast("decimal(19,0)") * col("__y2"))
          .as("__P"),
        sum(col("__y").cast("decimal(38,0)")).as("__A"),
        sum(col("__y2").cast("decimal(38,0)")).as("__B"))
      .crossJoin(broadcast(tot))
      // the ×n² centered numerator, exact decimal end to end
      .withColumn("__num",
        col("__n") * col("__n") * col("__P") -
          col("__n") * col("__S") * (col("__A") + col("__B")) +
          (col("__n") - col("lag")) * col("__S") * col("__S"))
      .persist())
    val num0 = perLag.filter(col("lag") === 0)
      .select(col("__num").as("__num0"))
    val rTab = perLag.crossJoin(broadcast(num0))
      .select(col("lag"), col("n_pairs"),
        col("__n").cast("double").as("__nd"),
        Grid.snap(when(col("__num0") > 0,
          col("__num").cast("double") / col("__num0").cast("double")),
          6).as("acf"))
    val terms = rTab
      .agg(expr("sort_array(collect_list(struct(lag, acf)))")
        .as("__ts"))
    rTab.crossJoin(broadcast(terms))
      .select(col("lag"), col("n_pairs"), col("acf"),
        Grid.snap(when(col("lag") >= 1,
          col("__nd") * (col("__nd") + 2.0) *
            expr("aggregate(filter(__ts, t -> t.lag >= 1 AND " +
              "t.lag <= lag), CAST(0.0 AS DOUBLE), " +
              "(a, t) -> a + t.acf * t.acf / (__nd - t.lag))")),
          4).as("q_lb"))
  }

  /** Partial autocorrelation via Durbin–Levinson (Box & Jenkins
    * 1970): `pacf(k)` = the lag-k AR coefficient with lags 1..k−1
    * partialled out — the AR-order identification column of the
    * correlogram ([[autocorrelation]] gives the MA side).
    *
    * Execution contract (the q352/q354 driver-fold family): the
    * distributed work is [[autocorrelation]]'s jobs; the recursion
    * itself runs DRIVER-side over the ≤64-lag bounded r table (the
    * Markov maxStates discipline — `maxLag ≤ 64` is a require), and
    * the result is a local relation. Every φ SNAPS at 6 after each
    * update, so the trajectory is a pure function of the grid r's and
    * any engine replays it: the inner products fold j-ascending, a
    * zero denominator nulls that and every later pacf, and a null r
    * (zero-variance series) nulls everything — both mirrored by the
    * oracle's unrolled SQL. Returns `(lag, acf, pacf)` for
    * `lag = 1..maxLag`.
    */
  def partialAutocorrelation(df: DataFrame, tCol: String, yCol: String,
      maxLag: Int, scale: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val ac = autocorrelation(df, tCol, yCol, maxLag, scale)
      .filter(col("lag") >= 1).select(col("lag"), col("acf"))
      .collect() // bounded: ≤ 64 rows by the maxLag require
    val r = new Array[Option[Double]](maxLag + 1)
    (1 to maxLag).foreach(k => r(k) = None)
    ac.foreach { row =>
      r(row.getLong(0).toInt) =
        if (row.isNullAt(1)) None else Some(row.getDouble(1))
    }
    val pacf = new Array[Option[Double]](maxLag + 1)
    var phi = Vector.empty[Option[Double]] // φ_{k−1, 1..k−1}
    (1 to maxLag).foreach { k =>
      val pkk: Option[Double] =
        if (k == 1) r(1).map(Grid.snapD(_, 6))
        else {
          val terms = (1 until k).map(j =>
            for (p <- phi(j - 1); rv <- r(k - j)) yield p * rv)
          val dens = (1 until k).map(j =>
            for (p <- phi(j - 1); rv <- r(j)) yield p * rv)
          for {
            rk <- r(k)
            num <- terms.foldLeft(Option(0.0))((a, t) =>
              for (av <- a; tv <- t) yield av + tv).map(rk - _)
            den <- dens.foldLeft(Option(0.0))((a, t) =>
              for (av <- a; tv <- t) yield av + tv).map(1.0 - _)
            if den != 0.0
          } yield Grid.snapD(num / den, 6)
        }
      pacf(k) = pkk
      phi = (1 until k).toVector.map(j =>
        for (p <- phi(j - 1); pk <- pkk; q <- phi(k - j - 1))
          yield Grid.snapD(p - pk * q, 6)) :+ pkk
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("lag", LongType, nullable = false),
      StructField("acf", DoubleType, nullable = true),
      StructField("pacf", DoubleType, nullable = true)))
    val rows = (1 to maxLag).map { k =>
      Row(k.toLong, r(k).map(Double.box).orNull,
        pacf(k).map(Double.box).orNull)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** The shared DFT twiddle tables for [[periodogram]]: cos/sin of
    * `2πj/n` for `j = 0..n−1`, driver-computed once (config-bounded)
    * and embedded as 17-digit literals — the q364 DCT-table device,
    * exploiting `cos(2πkt/n) = table[(k·t) mod n]` so ONE n-entry
    * table serves every frequency. Public so specs and oracles
    * regenerate the identical bits.
    */
  def cosTable(n: Int): Array[Double] =
    Array.tabulate(n)(j => math.cos(2.0 * math.Pi * j / n))
  def sinTable(n: Int): Array[Double] =
    Array.tabulate(n)(j => math.sin(2.0 * math.Pi * j / n))

  private def sparkLitArray(a: Array[Double]): String =
    a.map(Grid.lit17).mkString("array(", ",", ")")
  private[graft] def duckLitArray(a: Array[Double]): String =
    a.map(Grid.lit17).mkString("[", ",", "]")

  /** Discrete-Fourier periodogram over the series' FIRST `nWindow`
    * observations (Schuster 1898; the seasonality detector that
    * picks [[decompose]]/[[graft.operators.Forecast.holtWinters]]'s
    * period): for each frequency `k = 1..maxFreq`,
    * `a_k = Σ(y_t − ȳ)·cos(2πkt/n)`, `b_k` the sine sum, and
    * `power_k = (a_k² + b_k²)·2/n`, peaking where the series repeats
    * every `n/k` steps.
    *
    * Replay exactness: the mean-centering is carried ×n so it stays
    * integer (`n·y_t − S`, exact scaled longs — each under 2⁵³, so
    * their doubles are exact), the twiddle factors come from the
    * embedded [[cosTable]] literals indexed by `(k·t) mod n` (never
    * an in-engine `cos`, whose libm could differ), and each a/b sum
    * is an rn-ORDERED fold over the collected per-frequency list
    * (bounded: `nWindow ≤ 512` rows × `maxFreq ≤ 32`). A series
    * shorter than `nWindow` zero-pads implicitly (missing tail terms
    * contribute nothing — the standard zero-padded DFT reading).
    * Returns `(k, period, power)` with `period = n/k`.
    */
  def periodogram(df: DataFrame, tCol: String, yCol: String,
      nWindow: Int, maxFreq: Int, scale: Int = 2): DataFrame = {
    require(nWindow >= 8 && nWindow <= 512, s"bad nWindow $nWindow")
    require(maxFreq >= 1 && maxFreq <= 32 && maxFreq < nWindow,
      s"bad maxFreq $maxFreq")
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val cosL = sparkLitArray(cosTable(nWindow))
    val sinL = sparkLitArray(sinTable(nWindow))
    val series = df.select(col(tCol).as("__t"),
      floor(col(yCol).cast("double") * p + 0.5).cast("long")
        .as("__y"))
      .filter(col("__y").isNotNull)
    val win = Ranks.withGlobalRowNumber(series, Seq(col("__t")),
      "__rn").filter(col("__rn") <= nWindow)
      .select(col("__rn"), col("__y"))
    val tot = win.agg(count(lit(1)).as("__n"),
      sum(col("__y")).as("__S"))
    val terms = win
      .select(col("__rn"), col("__y"),
        explode(sequence(lit(1L), lit(maxFreq.toLong))).as("k"))
      .crossJoin(broadcast(tot))
      // ×n-carried centered sample: exact long, exact in double
      .withColumn("__yc",
        (col("__n") * col("__y") - col("__S")).cast("double"))
      .withColumn("__j",
        pmod(col("k") * (col("__rn") - 1L), lit(nWindow.toLong)))
      .select(col("k"), col("__n"), struct(col("__rn"),
        (col("__yc") * expr(s"element_at($cosL, CAST(__j + 1 " +
          "AS INT))")).as("tc"),
        (col("__yc") * expr(s"element_at($sinL, CAST(__j + 1 " +
          "AS INT))")).as("ts")).as("__s"))
    val folded = terms.groupBy(col("k"), col("__n"))
      .agg(expr("aggregate(sort_array(collect_list(__s)), " +
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x.tc)").as("__ca"),
        expr("aggregate(sort_array(collect_list(__s)), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + x.ts)").as("__cb"))
    val nD = col("__n").cast("double")
    val a = col("__ca") / (nD * p)
    val b = col("__cb") / (nD * p)
    folded.select(col("k"),
      Grid.snap(lit(nWindow.toDouble) / col("k").cast("double"), 4)
        .as("period"),
      Grid.snap((a * a + b * b) * 2.0 / nD, 4).as("power"))
      .orderBy(col("k"))
  }

  /** Trend/seasonal STRENGTH of the [[decompose]] decomposition
    * (Hyndman & Athanasopoulos FPP3 §4.3, Wang-Smith-Hyndman):
    * `F_seasonal = max(0, 1 − Var(R)/Var(S+R))` and
    * `F_trend = max(0, 1 − Var(R)/Var(T+R))` per series key — the
    * 0..1 gauges that decide whether [[graft.operators.Forecast
    * .holtWinters]] should carry a seasonal register at all.
    *
    * Exactness: S and R come from [[residuals]] on their 1e-4 grids,
    * so `S+R` and `y − S` (= T+R on the input's grid) scale to exact
    * longs; every variance is the n·Σx²−(Σx)² integer form in
    * DECIMAL(38,0) — order-free — with ONE double division at the
    * ratio. Returns `(key, n_points, var_resid, var_detrended,
    * var_deseasonalized, strength_seasonal, strength_trend)`.
    */
  def strength(df: DataFrame, keyCol: String, tCol: String,
      valueCol: String, period: Int, scale: Int = 2): DataFrame = {
    val res = residuals(df, keyCol, tCol, valueCol, period, scale)
      .select(col(keyCol),
        floor(col("resid") * 1e4 + 0.5).cast("long").as("__r"),
        (floor(col("resid") * 1e4 + 0.5) +
          floor(col("seasonal") * 1e4 + 0.5)).cast("long").as("__sr"),
        (floor(col(valueCol).cast("double") * 1e4 + 0.5) -
          floor(col("seasonal") * 1e4 + 0.5)).cast("long").as("__tr"))
    def varCols(c: String, n: Column) = {
      val s = sum(col(c).cast("decimal(38,0)"))
      val q = sum(col(c).cast("decimal(19,0)") * col(c))
      (n.cast("double") * q.cast("double") -
        s.cast("double") * s.cast("double")) /
        (n.cast("double") * n.cast("double") * 1e8)
    }
    val n = count(lit(1))
    val agg = res.groupBy(col(keyCol)).agg(
      n.as("n_points"),
      graft.functions.Grid.snap(varCols("__r", n), 6)
        .as("var_resid"),
      graft.functions.Grid.snap(varCols("__sr", n), 6)
        .as("var_detrended"),
      graft.functions.Grid.snap(varCols("__tr", n), 6)
        .as("var_deseasonalized"))
    agg.select(col(keyCol), col("n_points"), col("var_resid"),
      col("var_detrended"), col("var_deseasonalized"),
      graft.functions.Grid.snap(
        when(col("var_detrended") > 0.0,
          greatest(lit(0.0),
            lit(1.0) - col("var_resid") / col("var_detrended")))
          .otherwise(lit(0.0)), 6).as("strength_seasonal"),
      graft.functions.Grid.snap(
        when(col("var_deseasonalized") > 0.0,
          greatest(lit(0.0),
            lit(1.0) - col("var_resid") / col("var_deseasonalized")))
          .otherwise(lit(0.0)), 6).as("strength_trend"))
  }

  /** Wald–Wolfowitz runs test (1940) — is the series' above/below-
    * median sign sequence random? Values equal to the median DROP
    * (the standard convention), runs `R` = 1 + sign changes in t
    * order, and `z = (R − μ)/σ` with `μ = 2n₁n₀/n + 1`,
    * `σ² = 2n₁n₀(2n₁n₀ − n) / (n²(n − 1))` — every moment an exact
    * long product (documented bound: 2n₁n₀ < 2⁶³ ⇒ n ≲ 4·10⁹ — any
    * realistic aggregated series), one tree at the readout. The
    * randomness companion to [[autocorrelation]]'s white-noise gate:
    * ACF sees linear dependence, runs see any sign-pattern drift.
    *
    * Plan shape: the exact median comes from the distributed
    * sort-rank device + a counted-positions aggregate (no
    * unpartitioned window); the sign sequence pairs via ONE position
    * equi-join (the [[autocorrelation]] shift device). Returns one
    * row `(n, n_above, n_below, runs, z)`; `z` nulls when either
    * side is empty (σ = 0).
    */
  def runsTest(df: DataFrame, tCol: String, yCol: String,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val base = df.select(col(tCol).as("__t"),
      floor(col(yCol).cast("double") * p + 0.5).cast("long")
        .as("__y"))
      .filter(col("__y").isNotNull)
    val tot = base.agg(count(lit(1)).as("__nv"))
    // exact doubled median via the global rank device (value order)
    val rankedV = Ranks.withGlobalRowNumber(base,
      Seq(col("__y"), col("__t")), "__rv")
    val med2 = rankedV.crossJoin(broadcast(tot))
      .filter(col("__rv") === expr("(__nv + 1) div 2") ||
        col("__rv") === expr("(__nv + 2) div 2"))
      .agg((when(max(col("__nv")) % 2L === 1L, lit(2L))
        .otherwise(lit(1L)) * sum(col("__y"))).as("__m2"))
    val signs = base.crossJoin(broadcast(med2))
      .filter(col("__y") * 2L =!= col("__m2")) // median ties drop
      .withColumn("__s", when(col("__y") * 2L > col("__m2"), 1L)
        .otherwise(0L))
    // PINNED: the positioned sign sequence feeds the counts AND the
    // change join
    val seq2 = graft.CacheScope.register(Ranks.withGlobalRowNumber(
      signs.select(col("__t"), col("__s")), Seq(col("__t")), "__rn")
      .persist())
    val counts = seq2.agg(count(lit(1)).as("n"),
      sum(col("__s")).as("n_above"))
    val changes = seq2.select(col("__rn"), col("__s"))
      .join(seq2.select((col("__rn") - 1L).as("__rn"),
        col("__s").as("__s2")), Seq("__rn"))
      .agg(coalesce(sum(when(col("__s") =!= col("__s2"), 1L)
        .otherwise(0L)), lit(0L)).as("__ch"))
    val j = counts.crossJoin(broadcast(changes))
      .withColumn("n_below", col("n") - col("n_above"))
      .withColumn("runs",
        when(col("n") > 0L, col("__ch") + 1L).otherwise(0L))
    val twoAB = lit(2L) * col("n_above") * col("n_below")
    val nD = col("n").cast("double")
    val mu = twoAB.cast("double") / nD + 1.0
    val sig2 = twoAB.cast("double") *
      (twoAB - col("n")).cast("double") / (nD * nD * (nD - 1.0))
    j.select(col("n"), col("n_above"), col("n_below"), col("runs"),
      Grid.snap(when(col("n_above") > 0L && col("n_below") > 0L &&
        col("n") >= 2L,
        (col("runs").cast("double") - mu) / sqrt(sig2)), 4).as("z"))
  }
}
