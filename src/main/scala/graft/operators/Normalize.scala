package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source score normalization — heterogeneous sources score on
  * incomparable scales (one crawl's "quality 0.8" is another's 0.3),
  * so selection thresholds set globally silently over/under-sample
  * sources. Quantile normalization maps every source's distribution
  * onto the POOLED distribution: a doc at the p-th percentile of its
  * source takes the pooled p-th percentile's value.
  *
  * Everything is INTEGER-EXACT by construction (the microarray
  * nearest-rank-floor estimator): within-source position `r` (1-based
  * row_number on (value, id) — deterministic under ties), pooled index
  * `idx = ((r−1)·(N−1)) div (n−1)` in integer arithmetic (no float
  * percentile whose floor could straddle an exact boundary), and the
  * normalized value is the pooled (idx+1)-th smallest on the same
  * (value, id) order. A second engine replays every mapped value
  * bit-for-bit. Sources with one row map to the pooled minimum
  * (`idx = 0` — documented degenerate).
  *
  * Shape: one window at source grain, one window at pooled grain, one
  * equi-join on the pooled index — all partial/window passes; nothing
  * quadratic.
  */
object Normalize {

  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = graft.CacheScope.register(
      df.select(col(groupCol), col(idCol), col(valueCol))
        .filter(col(valueCol).isNotNull).persist())
    // pooled rank via distributed sort + zipWithIndex — NEVER a global
    // window (the single-partition WindowExec trap); the vocabulary-id
    // device from TokenizerTraining
    val sortedVals = base.select(col(valueCol), col(idCol))
      .orderBy(col(valueCol), col(idCol))
    val valField = sortedVals.schema.fields.head
    val pooledSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__qn_idx",
        org.apache.spark.sql.types.LongType, nullable = false),
      valField.copy(name = "__qn_pooled")))
    val pooled = spark.createDataFrame(
      sortedVals.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i, r.get(0))
      }, pooledSchema)
    val n = base.count()
    require(n > 0, "empty input")
    val byGroup = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    // integer-exact pooled index: ((r-1)(N-1)) div (n_g-1); the pmod
    // subtraction makes the numerator an exact multiple before the
    // divide (the Decay device). Exactness bound: (n_g-1)(N-1) < 2^63
    // — fine to ~3e9 pooled rows; beyond that, switch the index to the
    // approximate percentile grid.
    val num = (col("__qn_r") - 1) * lit(n - 1)
    val ranked = base
      .withColumn("__qn_r", row_number().over(byGroup).cast("long"))
      .withColumn("__qn_n", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
      .withColumn("__qn_idx",
        when(col("__qn_n") > 1,
          ((num - pmod(num, col("__qn_n") - 1)) / (col("__qn_n") - 1))
            .cast("long"))
          .otherwise(0L))
    ranked.join(pooled, Seq("__qn_idx"))
      .select(col(groupCol), col(idCol), col(valueCol),
        col("__qn_pooled").as("normalized"))
  }
}
