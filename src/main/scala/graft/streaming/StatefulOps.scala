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
}
