package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType, StructField}

/** Global ranking without the single-partition WindowExec trap.
  *
  * An unpartitioned `row_number()/ntile()` window funnels the whole
  * corpus through ONE task — the exact anti-pattern a 100 TB job dies
  * on. This device computes the same global 1-based row number with a
  * distributed RANGE SORT (every partition sorts its slice; the range
  * exchange keeps order across partitions) followed by
  * `zipWithIndex`, which runs one lightweight count job for the
  * per-partition offsets and then stamps indices fully in parallel —
  * the same plan `Normalize.quantileNormalize` established for pooled
  * quantiles. NTILE is then a CLOSED FORM of (rank, total): the SQL
  * standard deals `total = n·q + rem` rows as `rem` tiles of `q+1`
  * followed by `n−rem` tiles of `q`, so the tile of rank `r` is pure
  * integer arithmetic — no second pass, no window.
  */
object Ranks {

  /** `df` plus `rankCol` = 1-based global row number in the total
    * order of `sortCols`. One distributed sort + one index stamp;
    * deterministic iff `sortCols` is a total order (pass a unique
    * tie-break column).
    */
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(
      StructField(rankCol, LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
  }

  /** Ordered prefix scan over a CONFIG-BOUNDED frame without the
    * unpartitioned WindowExec: the frame shuffles to ONE deliberate
    * task (exactly the single partition the global window would have
    * used — this device replaces it, it does not parallelize it),
    * sorts by `sortCols`, and stamps in one sequential pass
    *   - for each `(in, out)` of `sums`: the INCLUSIVE running sum of
    *     `in` — LONG for integral inputs, DOUBLE for fractional,
    *     accumulated in sorted order so float folds replay exactly
    *     like the ordered window they replace;
    *   - `idxCol` (when nonEmpty): the 1-based row number.
    * The exclusive (`-1`-frame) variant of an INTEGRAL sum is
    * `out - in` (exact); for a fractional sum subtracting is NOT the
    * same float as the shorter fold — request those via `exclSums`,
    * which emits the PRE-increment accumulator (the shorter fold
    * itself, exact by construction). Null inputs add nothing (the
    * window aggregate's null-skipping) but keep their row.
    *
    * Contract: `df` must be config-bounded (bins, buckets, arms,
    * deciles, boundary grids — never the corpus); corpus-grain
    * cumulation belongs in keyed windows or the distributed
    * [[withGlobalRowNumber]] device.
    */
  def withOrderedPrefixScan(df: DataFrame, sortCols: Seq[Column],
      sums: Seq[(String, String)], idxCol: String = "",
      exclSums: Seq[(String, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartition(1).sortWithinPartitions(sortCols: _*)
    val schema0 = sorted.schema
    val all = sums.map((_, false)) ++ exclSums.map((_, true))
    val integral = all.map { case ((in, _), _) =>
      schema0(in).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
    }
    val withSums = all.zip(integral).foldLeft(schema0) {
      case (sch, (((_, out), _), isInt)) =>
        sch.add(StructField(out,
          if (isInt) LongType else DoubleType, nullable = false))
    }
    val schema =
      if (idxCol.isEmpty) withSums
      else withSums.add(StructField(idxCol, LongType, nullable = false))
    val idxs = all.map { case ((in, _), _) => schema0.fieldIndex(in) }
    val excl = all.map { case (_, isExcl) => isExcl }
    val n = all.size
    val stamped = sorted.rdd.mapPartitions { it =>
      val accL = Array.ofDim[Long](n)
      val accD = Array.ofDim[Double](n)
      var rowNo = 0L
      it.map { r =>
        rowNo += 1
        var k = 0
        val extra = Seq.newBuilder[Any]
        while (k < n) {
          val v = r.get(idxs(k))
          if (integral(k)) {
            // exclusive = the PRE-increment accumulator — the shorter
            // fold itself, not inclusive-minus-own (which for a
            // fractional sum is a DIFFERENT float than the shorter
            // fold; emitting the accumulator is exact by construction)
            if (excl(k)) extra += accL(k)
            if (v != null) accL(k) += v.asInstanceOf[Number].longValue
            if (!excl(k)) extra += accL(k)
          } else {
            if (excl(k)) extra += accD(k)
            if (v != null) accD(k) += v.asInstanceOf[Number].doubleValue
            if (!excl(k)) extra += accD(k)
          }
          k += 1
        }
        val tail =
          if (idxCol.isEmpty) extra.result() else extra.result() :+ rowNo
        Row.fromSeq(r.toSeq ++ tail)
      }
    }
    spark.createDataFrame(stamped, schema)
  }

  /** Exact positive integral division as a Column — the numerator is
    * made an exact multiple before the double divide (the Decay
    * device), exact while quotient < 2^53.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** SQL-standard NTILE(n) from a 1-based `rank` and the group
    * `total`: first `total % n` tiles take `total/n + 1` rows, the
    * rest `total/n`. Matches `ntile(n) OVER (ORDER BY ...)` row for
    * row (both Spark and DuckDB implement this dealing). Returns an
    * INTEGER column like Spark's `ntile`.
    */
  def ntileFromRank(rank: Column, n: Int, total: Column): Column = {
    require(n >= 1, s"bad ntile n $n")
    val q = idiv(total, lit(n.toLong))
    val rem = pmod(total, lit(n.toLong))
    val boundary = (q + 1L) * rem
    when(rank <= boundary, idiv(rank - 1L, q + 1L) + 1L)
      .otherwise(rem + idiv(rank - boundary - 1L, greatest(q, lit(1L)))
        + 1L)
      .cast("int")
  }

  /** `df` plus an INTEGER `tileCol` = `ntile(n)` over the global order
    * of `sortCols` — the composed device: one distributed sort-rank,
    * the tile closed form, and the row count as a 1-row broadcast.
    */
  def withGlobalNtile(df: DataFrame, sortCols: Seq[Column], n: Int,
      tileCol: String): DataFrame = {
    // pinned: the count agg and the tile projection both consume the
    // sorted-and-stamped frame — without the cache each would re-run
    // the range sort and the zipWithIndex offset job
    val ranked = graft.CacheScope.register(
      withGlobalRowNumber(df, sortCols, "__rk_rn").persist())
    val cnt = ranked.agg(count(lit(1)).as("__rk_total"))
    ranked.crossJoin(broadcast(cnt))
      .withColumn(tileCol,
        ntileFromRank(col("__rk_rn"), n, col("__rk_total")))
      .drop("__rk_rn", "__rk_total")
  }
}
