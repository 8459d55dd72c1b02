package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the temporal enrichment operator Spark's built-in joins
  * cannot express without an O(n·m) range join: for each left row, the
  * single most recent right row at or before its timestamp with the
  * same key (backward; the attribution / "state as of event time"
  * query), or the earliest at-or-after (forward). kdb's `aj`, Pandas'
  * `merge_asof`, DuckDB's `ASOF JOIN` — composed here from Spark
  * primitives instead of a custom physical operator: both sides UNION
  * into one keyed stream, one window partitioned by key carries the
  * last-seen right payload forward (`last(..., ignoreNulls)` over the
  * running frame), and left rows read it. ONE shuffle on the key, no
  * join node at all — cardinality per key is the only sequential
  * dimension, same as any sessionization.
  *
  * Tie rule: right rows order BEFORE left rows at an equal timestamp,
  * so an exactly-simultaneous right row matches (the DuckDB
  * `t_left >= t_right` convention). Equal-timestamp right DUPLICATES
  * within a key break ties by descending struct order of the payload —
  * deterministic, but give the right side unique (key, time) pairs if
  * the choice matters.
  */
object AsOfJoin {

  /** Backward as-of join. `rightPayload` names the right columns to
    * carry; they surface as `prefix + name`, all null when no right
    * row precedes the left row. `tolerance` (optional, in the
    * timestamp's native unit via the supplied `gap` expression
    * contract: microseconds for TIMESTAMP) nulls matches older than
    * the window.
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightPayload: Seq[String],
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name columns")
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map(right(_)): _*)
    val leftRow = struct(leftCols.map(left(_)): _*)
    val pType = right.select(payload.as("__p")).schema("__p").dataType
    val lType = left.select(leftRow.as("__l")).schema("__l").dataType
    val r = right.select(col(keyCol).as("__ao_k"),
      col(timeCol).as("__ao_t"), lit(0).as("__ao_side"),
      payload.as("__ao_p"), lit(null).cast(lType).as("__ao_l"))
    // carry the whole left row as a struct so arbitrary schemas survive
    val l = left.select(col(keyCol).as("__ao_k"),
      col(timeCol).as("__ao_t"), lit(1).as("__ao_side"),
      lit(null).cast(pType).as("__ao_p"), leftRow.as("__ao_l"))
    val u = r.unionByName(l)
    // right-before-left at equal time => inclusive match; payload-desc
    // among equal-time right duplicates => deterministic pick
    val w = Window.partitionBy(col("__ao_k"))
      .orderBy(col("__ao_t"), col("__ao_side"), col("__ao_p").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = u
      .withColumn("__ao_m", last(col("__ao_p"), ignoreNulls = true).over(w))
      .withColumn("__ao_mt", last(when(col("__ao_side") === 0,
        col("__ao_t")), ignoreNulls = true).over(w))
      .filter(col("__ao_side") === 1)
    val withinTol = toleranceMicros match {
      case Some(tol) =>
        carried.withColumn("__ao_ok",
          col("__ao_mt").isNotNull &&
            unix_micros(col("__ao_t")) - unix_micros(col("__ao_mt"))
              <= tol)
      case None => carried.withColumn("__ao_ok", col("__ao_mt").isNotNull)
    }
    val out = leftCols.map(c => col("__ao_l." + c).as(c)) ++
      rightPayload.map(c =>
        when(col("__ao_ok"), col("__ao_m." + c)).as(prefix + c))
    withinTol.select(out: _*)
  }

  /** Forward as-of: earliest right row at or after the left row's
    * time — [[asOfBackward]] with time reversed.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val negate = (df: DataFrame) => df.withColumn("__ao_neg",
      -unix_micros(col(timeCol)))
    val l2 = negate(left)
    val r2 = negate(right)
    asOfBackward(l2, r2, keyCol, "__ao_neg", rightPayload, prefix)
      .drop("__ao_neg")
  }

  /** Convenience gap column: microseconds between the left time and a
    * matched right time (null propagates).
    */
  def gapMicros(leftTime: Column, matchedTime: Column): Column =
    unix_micros(leftTime) - unix_micros(matchedTime)
}
