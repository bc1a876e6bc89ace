package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** P1 — the system's one generator/UDTF-shaped operator: flatten a depth
  * snapshot {lastUpdateId, bids[[price,qty]], asks[[price,qty]]} into
  * (symbol, price, qty, side, update_id, update_time) rows
  * (`orderbook_collector.py:34-37`).
  *
  * Two `explode`s + a union-by-name; each side is a single codegen'd
  * generate node, no shuffle. Input arrays are string pairs exactly as the
  * REST payload delivers them.
  */
object DepthFlatten {

  /** snapshot columns: symbol, update_id, update_time, bids, asks —
    * bids/asks are array<array<string>> ([price, qty] pairs). */
  def flatten(snapshots: DataFrame): DataFrame = {
    def side(colName: String, label: String): DataFrame =
      snapshots.select(col("symbol"), col("update_id"), col("update_time"),
          explode(col(colName)).as("pair"))
        .select(col("symbol"),
          element_at(col("pair"), 1).try_cast("double").as("price"),
          element_at(col("pair"), 2).try_cast("double").as("qty"),
          lit(label).as("side"), col("update_id"), col("update_time"))
    side("bids", "bid").unionByName(side("asks", "ask"))
      .na.drop(Seq("price", "qty"))
  }
}
