package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style table statistics — the catalog row a cost-based
  * planner (and every data-quality dashboard) consults: per column,
  * null count, distinct count, typed min/max, and mean string length,
  * all from ONE aggregation pass over the table (Spark plans the
  * multi-distinct via Expand — one shuffle, never a scan per column).
  *
  * `approxNdv = true` swaps exact distinct counts for HyperLogLog++
  * `approx_count_distinct` — the 100 TB setting (the exact form's
  * Expand multiplies rows by the column count; the sketch form is one
  * register set per column). Approx NDV is engine-specific, so the
  * gate pins the exact form and the spec bounds the sketch's error.
  *
  * Typed stats land in typed columns: numerics → `min_num`/`max_num`
  * (exact doubles), strings → `min_str`/`max_str` + `avg_len`,
  * date/time → ISO strings in `min_str`/`max_str`. Complex-typed
  * columns report null/distinct counts only.
  */
object Analyze {

  def tableStats(df: DataFrame, approxNdv: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val ndv =
        if (approxNdv) approx_count_distinct(c) else countDistinct(c)
      val base = Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nn_${f.name}"),
        ndv.as(s"__ndv_${f.name}"))
      val typed = f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"__mnn_${f.name}"),
          max(c).cast("double").as(s"__mxn_${f.name}"))
        case StringType => Seq(
          min(c).as(s"__mns_${f.name}"),
          max(c).as(s"__mxs_${f.name}"),
          sum(length(c)).as(s"__sl_${f.name}"))
        case DateType | TimestampType | TimestampNTZType => Seq(
          min(c).cast("string").as(s"__mns_${f.name}"),
          max(c).cast("string").as(s"__mxs_${f.name}"))
        case _ => Seq.empty
      }
      base ++ typed
    }
    val stat = df.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows = fields.map { f =>
      val (mnn, mxn) = f.dataType match {
        case _: NumericType =>
          (col(s"__mnn_${f.name}"), col(s"__mxn_${f.name}"))
        case _ => (nullD, nullD)
      }
      val (mns, mxs) = f.dataType match {
        case StringType | DateType | TimestampType | TimestampNTZType =>
          (col(s"__mns_${f.name}"), col(s"__mxs_${f.name}"))
        case _ => (nullS, nullS)
      }
      val avgLen = f.dataType match {
        case StringType => round(col(s"__sl_${f.name}").cast("double") /
          (col("__n") - col(s"__nn_${f.name}")).cast("double"), 4)
        case _ => nullD
      }
      struct(lit(f.name).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_${f.name}").as("n_nulls"),
        col(s"__ndv_${f.name}").as("ndv"), mnn.as("min_num"),
        mxn.as("max_num"), mns.as("min_str"), mxs.as("max_str"),
        avgLen.as("avg_len"))
    }
    stat.select(explode(array(rows: _*)).as("__s"))
      .select(col("__s.*"))
      .orderBy(col("col_name"))
  }

  /** One pre-aggregated cell of the value axis. */
  private[operators] final case class Cell(cell: Int, cnt: Long,
      s: Long, ss: Long)

  /** The SSE of pooling cells j..k (indices into the cells array),
    * 1e-6-rounded — the DP's only float.
    */
  private def sse(cells: IndexedSeq[Cell], j: Int, k: Int): Double = {
    var c = 0L; var s = 0L; var ss = 0L
    var i = j
    while (i <= k) {
      c += cells(i).cnt; s += cells(i).s; ss += cells(i).ss; i += 1
    }
    BigDecimal(ss - s.toDouble * s / c)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** V-optimal histogram (Jagadish et al., VLDB 1998 — the bucket
    * boundaries a cost-based optimizer actually wants): place
    * `buckets` boundaries over an integral value column minimizing
    * total within-bucket SSE. Two stages with very different scales:
    *
    *  1. ONE corpus aggregation to ≤ `inputCells` equi-width cells
    *     (cnt, sum, sum-of-squares — exact longs), keyed on the
    *     broadcast min/max row;
    *  2. the O(cells²·buckets) dynamic program over that bounded cell
    *     table — a driver fact by construction (the k-means-centroid
    *     contract). Every DP value re-rounds at 1e-6 and ties take
    *     the SMALLEST split, so the program (and its oracle replay,
    *     unrolled as one CTE layer per bucket) is engine-exact.
    *
    * Output: one row per final bucket — cell range, value range,
    * count, mean (4 dp), sse (4 dp).
    */
  def vOptimalHistogram(df: DataFrame, valueCol: String,
      inputCells: Int = 24, buckets: Int = 6): DataFrame = {
    require(inputCells >= 2 && inputCells <= 256,
      s"bad inputCells $inputCells")
    require(buckets >= 1 && buckets <= inputCells,
      s"bad buckets $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    val mm = df.filter(v.isNotNull)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    val cellRows = df.filter(v.isNotNull).crossJoin(broadcast(mm))
      .withColumn("__cell", expr(s"CAST(((${valueCol} - __mn) * " +
        s"${inputCells}L) DIV (__mx - __mn + 1) AS INT)"))
      .groupBy(col("__cell"))
      .agg(count(lit(1)).as("cnt"), sum(v).as("s"),
        sum(v * v).as("ss"))
      .orderBy(col("__cell"))
      .collect()
      .map(r => Cell(r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toIndexedSeq
    val n = cellRows.length
    val b = math.min(buckets, n)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // e(layer)(k): best SSE for cells 0..k using `layer+1` buckets;
    // split(layer)(k): the chosen FIRST cell of the last bucket
    val e = Array.ofDim[Double](b, n)
    val split = Array.ofDim[Int](b, n)
    for (k <- 0 until n) { e(0)(k) = sse(cellRows, 0, k)
      split(0)(k) = 0 }
    for (layer <- 1 until b; k <- 0 until n) {
      var best = Double.MaxValue; var bj = -1
      var j = layer // need at least `layer` cells before the split
      while (j <= k) {
        val cand = r6(e(layer - 1)(j - 1) + sse(cellRows, j, k))
        if (cand < best) { best = cand; bj = j }
        j += 1
      }
      e(layer)(k) = if (bj < 0) e(layer - 1)(k) else best
      split(layer)(k) = if (bj < 0) split(layer - 1)(k) else bj
    }
    // backtrace the boundaries
    var bounds = List.empty[Int]
    var k = n - 1
    var layer = b - 1
    while (layer >= 0) {
      val j = split(layer)(k)
      bounds = j :: bounds
      k = j - 1
      layer -= 1
    }
    val (mnv, mxv) = {
      val r = mm.head(); (r.getLong(0), r.getLong(1))
    }
    val width = (mxv - mnv + 1).toDouble / inputCells
    val out = bounds.zip(bounds.tail :+ n).zipWithIndex.map {
      case ((lo, hiEx), i) =>
        val hi = hiEx - 1
        var c = 0L; var s = 0L
        (lo to hi).foreach { x =>
          c += cellRows(x).cnt; s += cellRows(x).s }
        (i + 1, cellRows(lo).cell, cellRows(hi).cell,
          mnv + math.floor(cellRows(lo).cell * width).toLong,
          c, BigDecimal(s.toDouble / c).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(sse(cellRows, lo, hi)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.toDF("bucket", "cell_lo", "cell_hi", "value_lo", "cnt",
      "mean", "sse")
  }
}
