package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** REST ingestion connector (reference §2.1 S1/S2/S4/S5/S6).
  *
  * The reference's client behaviors, as connector policy rather than plan
  * operators: host failover skipping 451/403/429/5xx with an inter-request
  * pause (`src/binance/api.py:11-42`), page-size-capped kline fetches
  * (`:44-75`) — PLUS the pagination loop the reference lacks (its single
  * request silently truncates windows >1000 bars, SURVEY §3.1).
  *
  * The HTTP transport is an injected function, so the connector logic is
  * fully testable in zero-egress environments and swappable for any client.
  * Fetching happens driver-side (these are ≤1000-row control-plane reads —
  * the data plane is the parquet/CSV path); the result lands in a DataFrame
  * via `createDataFrame` exactly like the reference lands rows in CSV.
  */
object Rest {

  /** url → Left(httpStatus) on failure | Right(body). */
  type Transport = String => Either[Int, String]

  val DefaultSkipStatuses: Int => Boolean = s =>
    s == 451 || s == 403 || s == 429 || s >= 500

  /** Try each host in order; skip hosts failing with a skippable status;
    * throw the last error if all hosts fail. Mirrors api.py:24-42. */
  def fetchWithFailover(hosts: Seq[String], pathAndQuery: String,
                        transport: Transport,
                        skip: Int => Boolean = DefaultSkipStatuses,
                        pauseMs: Long = 100): String = {
    var lastStatus = -1
    hosts.foreach { h =>
      transport(s"$h$pathAndQuery") match {
        case Right(body) => return body
        case Left(status) if skip(status) =>
          lastStatus = status
          if (pauseMs > 0) Thread.sleep(pauseMs)
        case Left(status) =>
          throw new RuntimeException(s"REST fetch failed: HTTP $status from $h")
      }
    }
    throw new RuntimeException(s"all hosts failed, last HTTP $lastStatus")
  }

  /** One kline bar as fetched (positional array fields 0..8,
    * prices_collector.py:32-43). */
  case class Kline(openTimeMs: Long, open: Double, high: Double, low: Double,
                   close: Double, volume: Double, numTrades: Long)

  private lazy val mapper = new ObjectMapper()

  /** Parse the klines JSON payload: array of positional arrays. */
  def parseKlines(body: String): Seq[Kline] = {
    val root = mapper.readTree(body)
    root.elements().asScala.map { r =>
      Kline(r.get(0).asLong(), r.get(1).asText().toDouble, r.get(2).asText().toDouble,
        r.get(3).asText().toDouble, r.get(4).asText().toDouble,
        r.get(5).asText().toDouble, Try(r.get(8).asLong()).getOrElse(0L))
    }.toSeq
  }

  /** Paginated kline fetch over [startMs, endMs): repeatedly requests
    * `limit`-bar pages, advancing past the last returned bar — the fix for
    * the reference's silent >1000-bar truncation. `fetchPage(start, end,
    * limit)` is usually fetchWithFailover + parseKlines composed. */
  def paginateKlines(fetchPage: (Long, Long, Int) => Seq[Kline],
                     startMs: Long, endMs: Long, limit: Int = 1000,
                     stepMs: Long = 60000L): Seq[Kline] = {
    val out = Seq.newBuilder[Kline]
    var cursor = startMs
    var guard = 0
    while (cursor < endMs && guard < 100000) {
      val page = fetchPage(cursor, endMs, limit)
      if (page.isEmpty) { cursor = endMs }
      else {
        out ++= page.filter(k => k.openTimeMs >= cursor && k.openTimeMs < endMs)
        cursor = page.map(_.openTimeMs).max + stepMs
      }
      guard += 1
    }
    out.result()
  }

  /** One recent trade (`/api/v3/trades` object fields,
    * trades_collector.py:36-46). */
  case class Trade(tradeId: Long, price: Double, qty: Double, quoteQty: Double,
                   timeMs: Long, isBuyerMaker: Boolean, isBestMatch: Boolean)

  /** Parse the recent-trades JSON payload: array of objects. */
  def parseTrades(body: String): Seq[Trade] = {
    val root = mapper.readTree(body)
    root.elements().asScala.map { t =>
      Trade(t.get("id").asLong(), t.get("price").asText().toDouble,
        t.get("qty").asText().toDouble, t.get("quoteQty").asText().toDouble,
        t.get("time").asLong(), t.get("isBuyerMaker").asBoolean(),
        t.get("isBestMatch").asBoolean())
    }.toSeq
  }

  /** One depth level. `side` is "bid" | "ask" (orderbook_collector.py:33-37). */
  case class DepthLevel(price: Double, qty: Double, side: String, updateId: Long)

  /** Parse the `/api/v3/depth` payload: lastUpdateId + bids/asks as
    * [price, qty] string pairs. */
  def parseDepth(body: String): Seq[DepthLevel] = {
    val root = mapper.readTree(body)
    val updateId = root.get("lastUpdateId").asLong()
    def levels(field: String, side: String): Seq[DepthLevel] =
      root.get(field).elements().asScala.map { pq =>
        DepthLevel(pq.get(0).asText().toDouble, pq.get(1).asText().toDouble,
          side, updateId)
      }.toSeq
    levels("bids", "bid") ++ levels("asks", "ask")
  }

  /** Land fetched bars as a candles DataFrame (schema per SURVEY §1.2). */
  def klinesToDataFrame(spark: SparkSession, symbol: String, tf: String,
                        klines: Seq[Kline]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    klines.toDF()
      .withColumn("symbol", lit(symbol)).withColumn("tf", lit(tf))
      .withColumn("open_time", timestamp_millis(col("openTimeMs")))
      .withColumnRenamed("numTrades", "num_trades")
      .select("symbol", "tf", "open_time", "open", "high", "low", "close",
        "volume", "num_trades")
  }
}
