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
}
