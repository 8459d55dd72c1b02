package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins — the 100 TB failure mode where a
  * handful of hot keys make one shuffle partition carry most of the data.
  *
  * Two complementary levers:
  *  1. AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin.*`,
  *     on by default in the session builders here) handles moderate skew
  *     transparently.
  *  2. [[saltedJoin]] handles extreme skew deterministically at plan time:
  *     the build side is replicated `saltFactor`× and the probe side's
  *     rows are spread across the salt range by a hash of their OWN row,
  *     so one hot key fans out over `saltFactor` partitions. The salt is
  *     derived with `pmod(hash(...))` — deterministic, no RNG, safe under
  *     task retries (unlike `rand()`-based salting).
  */
object SkewJoins {

  /** Equi-join `probe.probeKey == build.buildKey` with the build side
    * replicated over a salt dimension. Result rows are identical to the
    * plain join — only the shuffle distribution changes.
    *
    * @param probe      the large, possibly skewed side
    * @param build      the smaller side (replicated saltFactor times)
    * @param probeKey   join key column on the probe side
    * @param buildKey   join key column on the build side
    * @param saltCols   probe-side columns whose hash spreads the hot keys
    *                   (pick high-cardinality columns, e.g. the row id)
    * @param saltFactor number of splits per key
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, saltCols: Seq[Column],
      saltFactor: Int = 8): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(saltFactor)))
    val replicated = build
      .withColumn("__bsalt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        col(probeKey) === col(buildKey) && col("__salt") === col("__bsalt"))
      .drop("__salt", "__bsalt")
  }
}
