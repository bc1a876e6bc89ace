package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the arbitrary-state
  * escape hatch for semantics windowed aggregation can't express.
  *
  * Scale: state is one small case class PER KEY (symbol), partitioned by
  * the group key across executors and checkpointed incrementally; a
  * timeout policy (not needed for the always-live symbol universe here)
  * would bound state for unbounded key domains.
  */
object StatefulOps {

  case class TradeEvent(symbol: String, price: Double, qty: Double)
  case class VwapState(cumNotional: Double, cumQty: Double, n: Long)
  case class VwapUpdate(symbol: String, vwap: Double, cumQty: Double, n: Long)

  /** Running per-symbol VWAP over the whole stream: each micro-batch folds
    * its trades into the persistent (notional, qty, count) state and emits
    * one update row per touched symbol. */
  def runningVwap(trades: Dataset[TradeEvent]): Dataset[VwapUpdate] = {
    import trades.sparkSession.implicits._
    trades.groupByKey(_.symbol)
      .flatMapGroupsWithState[VwapState, VwapUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (symbol: String, events: Iterator[TradeEvent], state: GroupState[VwapState]) =>
          var s = state.getOption.getOrElse(VwapState(0.0, 0.0, 0L))
          events.foreach { e =>
            s = VwapState(s.cumNotional + e.price * e.qty, s.cumQty + e.qty, s.n + 1)
          }
          state.update(s)
          val vwap = if (s.cumQty == 0) 0.0 else s.cumNotional / s.cumQty
          Iterator(VwapUpdate(symbol, vwap, s.cumQty, s.n))
      }
  }

  case class SeriesEvent(symbol: String, ts: Long, value: Double)
  case class EwmaState(ewma: Double, lastTs: Long, n: Long)
  case class EwmaUpdate(symbol: String, ts: Long, ewma: Double, n: Long)

  /** Streaming counterpart of [[graft.operators.ScanOps.ewmaPerKey]]: the
    * same y_0 = x_0; y = (1−a)·y + a·x recurrence folded across
    * micro-batches, one EwmaState per key. A micro-batch's group iterator
    * carries no order guarantee, so each batch's events are sorted by
    * (ts, value) before folding — the within-batch sort is bounded by the
    * batch's per-key row count, and cross-batch order holds when upstream
    * watermarking delivers batches in event-time order (late rows would
    * need the full out-of-order merge the batch operator does for free).
    * Emits one update per key per touched batch (the post-batch state). */
  def runningEwma(events: Dataset[SeriesEvent], alpha: Double): Dataset[EwmaUpdate] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val c = 1.0 - alpha
    import events.sparkSession.implicits._
    events.groupByKey(_.symbol)
      .flatMapGroupsWithState[EwmaState, EwmaUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (symbol: String, batch: Iterator[SeriesEvent], state: GroupState[EwmaState]) =>
          val sorted = batch.toVector.sortBy(e => (e.ts, e.value))
          var s = state.getOption.getOrElse(EwmaState(Double.NaN, Long.MinValue, 0L))
          sorted.foreach { e =>
            s =
              if (s.n == 0L) EwmaState(e.value, e.ts, 1L)
              else EwmaState(c * s.ewma + alpha * e.value, e.ts, s.n + 1L)
          }
          state.update(s)
          Iterator(EwmaUpdate(symbol, s.lastTs, s.ewma, s.n))
      }
  }

  case class GridEvent(key: String, hour: Long, value: Double)
  case class FfillState(lastHour: Long, lastValue: Double)
  case class GridRow(key: String, hour: Long, value: Double, isGap: Boolean)

  /** Streaming counterpart of q149's resample + forward-fill: per key,
    * every grid hour between the last observed point and each new one is
    * emitted as a carried gap row, so a live consumer always sees a DENSE
    * hourly grid (the chart-continuity contract the reference's pandas
    * `resample().ffill()` provides offline).
    *
    * State per key is one (lastHour, lastValue) pair — O(1), checkpointed
    * incrementally; the rows a batch emits are bounded by the hours that
    * actually elapsed. Within-batch order is restored by an in-memory
    * sort (bounded by the batch's per-key row count); a duplicate grid
    * point is last-write-wins re-emitted; a late row BEHIND the grid
    * clock is dropped — the batch operator (q149) does the full
    * out-of-order merge for free, and reconciling a replay is its job.
    */
  def gridFfill(events: Dataset[GridEvent]): Dataset[GridRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[FfillState, GridRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[GridEvent], state: GroupState[FfillState]) =>
          val sorted = batch.toVector.sortBy(e => (e.hour, e.value))
          val out = Vector.newBuilder[GridRow]
          var s = state.getOption.getOrElse(FfillState(Long.MinValue, Double.NaN))
          sorted.foreach { e =>
            if (s.lastHour == Long.MinValue || e.hour == s.lastHour) {
              out += GridRow(key, e.hour, e.value, isGap = false)
              s = FfillState(e.hour, e.value)
            } else if (e.hour > s.lastHour) {
              var h = s.lastHour + 1
              while (h < e.hour) {
                out += GridRow(key, h, s.lastValue, isGap = true); h += 1
              }
              out += GridRow(key, e.hour, e.value, isGap = false)
              s = FfillState(e.hour, e.value)
            } // else: behind the grid clock — dropped (see scaladoc)
          }
          state.update(s)
          out.result().iterator
      }
  }
}
