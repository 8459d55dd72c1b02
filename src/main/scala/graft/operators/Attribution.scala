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

  /** Simplified Shapley attribution (Zhao et al. 2018 — the
    * coalition-game answer to "which channel actually causes
    * conversions", beside last-touch/position/Markov): each user
    * reduces to their SET of touched channels and a converted flag,
    * `v(S)` = conversion rate of users with exactly set S (unobserved
    * sets contribute 0), and channel c's Shapley value is
    *
    *   φ_c = Σ_{S ⊆ C∖{c}} |S|!·(|C|−|S|−1)!/|C|! · (v(S∪{c}) − v(S))
    *
    * Scale shape: the corpus collapses to ≤ 2^|C| (channel-set,
    * rate) rows — |C| is the BOUNDED channel alphabet (≤ 16
    * enforced), so the v table is a driver fact by construction (the
    * k-means-centroid contract) and the 2^|C| enumeration runs
    * driver-side. Rates snap to the 1e-6 grid and the per-channel
    * terms fold in sorted subset order with a per-step snap
    * ([[graft.functions.Grid]] — the engine-exact IEEE device, same
    * program in the oracle), so φ replays bit-exactly.
    */
  def shapleyAttribution(events: DataFrame, subjectCol: String,
      typeCol: String, convType: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val users = events.groupBy(col(subjectCol))
      .agg(sort_array(collect_set(
        when(col(typeCol) =!= convType, col(typeCol)))).as("__chs"),
        max(when(col(typeCol) === convType, 1L).otherwise(0L))
          .as("__conv"))
    // bound the channel alphabet DISTRIBUTIVELY before any collect —
    // an unbounded alphabet must fail fast, not blow the driver with
    // a 2^|C|-row v table first
    val nChannels = events.filter(col(typeCol) =!= convType)
      .agg(countDistinct(col(typeCol))).head().getLong(0)
    require(nChannels <= 16,
      s"channel alphabet too large for exact Shapley: $nChannels > 16")
    val vRows = users
      .groupBy(concat_ws(",", col("__chs")).as("skey"))
      .agg(count(lit(1)).as("n"), sum(col("__conv")).as("nc"))
      .withColumn("v", graft.functions.Grid.snap(
        col("nc").cast("double") / col("n").cast("double")))
      .collect()
    val v = vRows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val channels = vRows.flatMap(_.getString(0).split(","))
      .filter(_.nonEmpty).distinct.sorted.toSeq
    // Double-fold factorial: Int `(1 to n).product` wraps at 13!,
    // silently corrupting weights for the 13..16-channel alphabets
    // the bound above explicitly allows
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val nC = channels.size
    def r6(x: Double) = graft.functions.Grid.snapD(x)
    val phis = channels.map { c =>
      val others = channels.filterNot(_ == c)
      val subsetTerms = (0 until (1 << others.size)).map { mask =>
        val s = others.zipWithIndex.filter { case (_, i) =>
          (mask & (1 << i)) != 0
        }.map(_._1)
        val w = fact(s.size) * fact(nC - s.size - 1) / fact(nC)
        val k0 = s.sorted.mkString(",")
        val k1 = (s :+ c).sorted.mkString(",")
        (k0, w * (v.getOrElse(k1, 0.0) - v.getOrElse(k0, 0.0)))
      }.sortBy(_._1)
      val phi = subsetTerms.foldLeft(0.0) { case (acc, (_, t)) =>
        r6(acc + t)
      }
      (c, subsetTerms.size.toLong, phi)
    }
    phis.toDF("channel", "n_subsets", "shapley")
  }
}
