package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic sources (reference §2.1 S3: the OFFLINE fixture
  * source, `src/binance/api.py:56-64` — ≤10 one-minute bars, constant
  * price, zero volume). Generalized: `spark.range` + column expressions,
  * so the generator itself is distributed and scale-free.
  */
object Synthetic {

  /** The reference OFFLINE klines: n bars ending now-ish with a fixed end
    * time for reproducibility, 60 s step, constant prices, volume 0. */
  def offlineKlines(spark: SparkSession, symbol: String, tf: String, n: Int,
                    endEpochSec: Long): DataFrame =
    spark.range(n.toLong)
      .withColumn("symbol", lit(symbol))
      .withColumn("tf", lit(tf))
      .withColumn("open_time", timestamp_seconds(lit(endEpochSec) - (lit(n.toLong) - col("id")) * 60))
      .withColumn("open", lit(1.0)).withColumn("high", lit(1.0))
      .withColumn("low", lit(1.0)).withColumn("close", lit(1.0))
      .withColumn("volume", lit(0.0)).withColumn("num_trades", lit(0L))
      .drop("id")

  /** Deterministic OFFLINE depth snapshot: `levels` bid levels descending
    * from 99.9 and ask levels ascending from 100.1, constant qty — the
    * orderbook analogue of the reference's OFFLINE klines fixture. */
  def syntheticDepth(spark: SparkSession, symbol: String, levels: Int,
                     atEpochSec: Long): DataFrame = {
    val base = spark.range(levels.toLong)
      .withColumn("symbol", lit(symbol))
      .withColumn("update_id", lit(1000L))
      .withColumn("update_time", timestamp_seconds(lit(atEpochSec)))
      .withColumn("qty", lit(1.0) + col("id").cast("double") / 10.0)
    val bids = base.withColumn("side", lit("bid"))
      .withColumn("price", lit(99.9) - col("id").cast("double") * 0.1)
    val asks = base.withColumn("side", lit("ask"))
      .withColumn("price", lit(100.1) + col("id").cast("double") * 0.1)
    bids.unionByName(asks)
      .select("symbol", "price", "qty", "side", "update_id", "update_time")
  }

  /** Deterministic pseudo-random trades for tests/benchmarks: price and qty
    * derived from hash-of-id arithmetic — reproducible, no RNG state. */
  def syntheticTrades(spark: SparkSession, symbol: String, n: Long,
                      startEpochSec: Long): DataFrame =
    spark.range(n)
      .withColumn("symbol", lit(symbol))
      .withColumn("trade_id", col("id"))
      .withColumn("trade_time", timestamp_seconds(lit(startEpochSec) + col("id")))
      .withColumn("price", lit(100.0) + (pmod(hash(col("id")), lit(1000)).cast("double") / 100.0))
      .withColumn("qty", lit(0.01) + (pmod(hash(col("id") + 1), lit(100)).cast("double") / 1000.0))
      .withColumn("is_buyer_maker", pmod(col("id"), lit(2)) === 0)
      .drop("id")
}
