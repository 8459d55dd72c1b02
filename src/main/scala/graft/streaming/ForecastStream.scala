package graft.streaming

import graft.operators.Forecast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming Holt forecasting: the per-key (level, trend) recursion
  * continued batch-by-batch through [[Forecast.holtLinearFrom]] — the
  * left-fold structure makes `resume(fold(A), B) == fold(A ++ B)`
  * exact, so the streamed state equals the whole-history batch fold
  * (spec'd), while each micro-batch touches only its own points.
  *
  * Contract: batches arrive in event-time order per key (the same
  * ordered-arrival contract as every sequential fold here), and a
  * key's FIRST batch carries ≥ 2 points (the classic-init minimum —
  * a 1-point debut is dropped by [[Forecast.holtLinear]]).
  */
object ForecastStream {

  /** `sink(state, batchId)` receives the updated full state table
    * (`key, n_obs, level, trend, forecast_h`) after each batch folds
    * in; the previous state is released once the new one is pinned.
    */
  def holtBatches(rows: DataFrame, keyCol: String, tCol: String,
      valueCol: String, alpha: Double, beta: Double, horizon: Int)(
      sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    var state: Option[DataFrame] = None
    rows.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val next = state match {
          case None => Forecast.holtLinear(batch, keyCol, tCol,
            valueCol, alpha, beta, horizon)
          case Some(st) => Forecast.holtLinearFrom(batch, keyCol, tCol,
            valueCol, st, alpha, beta, horizon)
        }
        val pinned = next.cache()
        pinned.count()
        state.foreach(_.unpersist())
        state = Some(pinned)
        sink(pinned, batchId)
    }
  }

  /** The SEASONAL model under the same carry: first batch =
    * [[Forecast.holtWintersState]] classic init, later batches =
    * [[Forecast.holtWintersFrom]] — the `2 + period`-cell state
    * (level, trend, register array) rides the state table, and the
    * left-fold law makes the streamed state equal the whole-history
    * fold exactly (spec'd), gappy slots and all.
    */
  def holtWintersBatches(rows: DataFrame, keyCol: String, tCol: String,
      valueCol: String, period: Int, alpha: Double, beta: Double,
      gamma: Double)(sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    var state: Option[DataFrame] = None
    rows.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val next = state match {
          case None => Forecast.holtWintersState(batch, keyCol, tCol,
            valueCol, period, alpha, beta, gamma)
          case Some(st) => Forecast.holtWintersFrom(batch, keyCol,
            tCol, valueCol, st, period, alpha, beta, gamma)
        }
        val pinned = next.cache()
        pinned.count()
        state.foreach(_.unpersist())
        state = Some(pinned)
        sink(pinned, batchId)
    }
  }
}
