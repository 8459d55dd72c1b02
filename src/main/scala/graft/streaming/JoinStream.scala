package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution join run with BOTH
  * sides unbounded: conversions pair with the same user's clicks at
  * most `maxDelaySeconds` earlier. The event-time bound plus the
  * watermarks is what makes this finite: Spark keeps click state
  * only until `watermark + maxDelay` has passed its event time, so
  * state is the recent window, never the stream's history — the
  * textbook requirement for a production stream-stream join (an
  * unbounded-state join is a memory leak wearing a plan).
  *
  * Inner-join append semantics: a pair emits once both sides have
  * arrived; late rows beyond the watermark drop (the same contract
  * as every watermarked op here). The spec pins stream ≡ the batch
  * interval join on in-order tapes.
  */
object JoinStream {

  /** `clicks(user_id, click_id, ts)` ⋈ `convs(user_id, conv_id, ts)`
    * where the conversion lands in `[click.ts, click.ts + maxDelay]`.
    */
  def clickAttribution(clicks: DataFrame, convs: DataFrame,
      maxDelaySeconds: Int, watermark: String = "1 hour"): DataFrame = {
    require(maxDelaySeconds > 0, s"bad maxDelay $maxDelaySeconds")
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("click_id"),
        col("ts").as("click_ts"))
    val v = convs.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("conv_id"),
        col("ts").as("conv_ts"))
    c.join(v, expr(
      s"""c_user = v_user AND
         |conv_ts >= click_ts AND
         |conv_ts <= click_ts + interval $maxDelaySeconds seconds
         |""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("conv_id"), col("click_ts"), col("conv_ts"))
  }
}
