package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Position-based ("U-shaped") multi-touch attribution — the marketing
  * standard between last-touch (all credit to the final click, see
  * [[AsOfJoin]] for that shape) and linear (all touches equal): the
  * FIRST touch introduced the user, the LAST touch closed the deal,
  * the middle kept the thread alive.
  *
  * Credit per conversion: 1 touch → 1.0; 2 touches → 0.5/0.5;
  * k ≥ 3 → `firstW` to the first, `lastW` to the last, the remaining
  * `1 − firstW − lastW` split evenly across the k−2 middles. Credit
  * is an exact function of integer ranks, so a second engine replays
  * every per-touch credit bit-for-bit (same division operands).
  *
  * Scale shape: the touch↔conversion pairing is an equi-join on the
  * subject key filtered to the lookback window — per-subject event
  * counts bound the pair fan-out, never the corpus; ranks come from
  * one window at (subject, conversion) grain; the channel rollup is
  * one partial-agg shuffle.
  */
object Attribution {

  def positionBased(events: DataFrame, subjectCol: String, tsCol: String,
      tieCol: String, channelCol: String, isConversion: Column,
      isTouch: Column, windowMicros: Long, firstW: Double = 0.4,
      lastW: Double = 0.4): DataFrame = {
    require(firstW >= 0 && lastW >= 0 && firstW + lastW <= 1,
      s"bad position weights $firstW/$lastW")
    val conv = events.filter(isConversion)
      .select(col(subjectCol).as("__s"), unix_micros(col(tsCol)).as("__ct"),
        col(tieCol).as("__cid"))
    val touch = events.filter(isTouch)
      .select(col(subjectCol).as("__s"), unix_micros(col(tsCol)).as("__tt"),
        col(tieCol).as("__tid"), col(channelCol).as("channel"))
    val w = Window.partitionBy(col("__s"), col("__cid"))
    val ranked = touch.join(conv, Seq("__s"))
      .filter(col("__tt") < col("__ct") &&
        col("__tt") >= col("__ct") - windowMicros)
      .withColumn("__rn",
        row_number().over(w.orderBy(col("__tt"), col("__tid"))))
      .withColumn("__k", count(lit(1)).over(w))
    val midW = 1.0 - firstW - lastW
    ranked
      .withColumn("credit",
        when(col("__k") === 1, lit(1.0))
          .when(col("__k") === 2, lit(0.5))
          .when(col("__rn") === 1, lit(firstW))
          .when(col("__rn") === col("__k"), lit(lastW))
          .otherwise(lit(midW) / (col("__k") - 2).cast("double")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("credit")), 4).as("credit"))
  }
}
