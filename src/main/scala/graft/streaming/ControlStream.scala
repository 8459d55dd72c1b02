package graft.streaming

import graft.operators.Robust
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming EWMA control charts — the SPC phase discipline mapped to
  * micro-batches: a key's FIRST batch calibrates (phase I:
  * [[Robust.ewmaControl]] estimates center and limit), every later
  * batch monitors against the PINNED calibration (phase II:
  * [[Robust.ewmaControlFrom]]). Given pinned limits the walk is a
  * pure left fold, so however the stream slices into batches the
  * state equals one resume over the concatenation (spec'd batch ≡
  * stream). The [[ForecastStream]] carry with calibration pinning.
  */
object ControlStream {

  /** `sink(state, batchId)` receives the full updated chart table
    * (`key, n_obs, mu0, sigma0, limit, ewma_final, n_alarms,
    * first_alarm_t`) after each batch folds in.
    */
  def ewmaBatches(rows: DataFrame, keyCol: String, tCol: String,
      valueCol: String, lambda: Double, l: Double)(
      sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    var state: Option[DataFrame] = None
    rows.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val next = state match {
          case None => Robust.ewmaControl(batch, keyCol, tCol,
            valueCol, lambda, l)
          case Some(st) => Robust.ewmaControlFrom(batch, keyCol, tCol,
            valueCol, st, lambda, l)
        }
        val pinned = next.cache()
        pinned.count()
        state.foreach(_.unpersist())
        state = Some(pinned)
        sink(pinned, batchId)
    }
  }
}
