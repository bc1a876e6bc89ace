package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Synthetic

/** End-to-end artifact fan-out (reference §3.3 lifecycle). */
class AnalyzeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("analyze emits the full artifact set from a two-symbol corpus") {
    val candles = Synthetic.offlineKlines(spark, "AAA", "1m", 90, 1704072600L)
      .withColumn("close", col("close") + pmod(hash(col("open_time")), lit(100)).cast("double") / 100.0)
      .withColumn("volume", pmod(hash(col("open_time"), lit(7)), lit(50)).cast("double"))
      .unionByName(Synthetic.offlineKlines(spark, "BBB", "1m", 90, 1704072600L))
    val out = Files.createTempDirectory("analyze").toString
    // Trades inside the candle window; a 30-level book snapshot. Supplying
    // them exercises the reference's full §3.3 artifact fan-out (large
    // trades + orderbook reports alongside the candle artifacts).
    val trades = Synthetic.syntheticTrades(spark, "AAA", 300, 1704072600L - 90 * 60)
    val book = Synthetic.syntheticDepth(spark, "AAA", 30, 1704072600L)
    Analyze.run(spark, candles, out, focusSymbol = Some("AAA"),
      trades = Some(trades), book = Some(book))
    val expected = Seq("metrics_summary", "daily_summary", "monthly_volume",
      "hourly_profile", "dow_profile", "heatmap_absret", "heatmap_volume",
      "anomalies_top", "vol_vs_volume_sample")
    expected.foreach { d =>
      assert(Files.isDirectory(Paths.get(out, d)), s"missing artifact dir $d")
      val n = spark.read.option("header", "true").csv(s"$out/$d").count()
      assert(n > 0, s"empty artifact $d")
    }
    Seq("summary_correlation.json", "summary_overall.json", "summary_coverage.json",
        "summary_large_trades.json", "summary_orderbook.json")
      .foreach { fjson =>
        assert(Files.exists(Paths.get(out, fjson)), s"missing $fjson")
        assert(Files.readString(Paths.get(out, fjson)).startsWith("{"))
      }
    // metrics has one row per symbol, ordered
    val m = spark.read.option("header", "true").csv(s"$out/metrics_summary")
    assert(m.select("symbol").collect().map(_.getString(0)).toSeq == Seq("AAA", "BBB"))

    // Large-trades report: scalar summary + bounded top_rows, parseable as
    // one JSON object with the reference's field set.
    val lt = spark.read.json(s"$out/summary_large_trades.json")
    assert(!lt.columns.contains("_corrupt_record"), "large-trades JSON unparseable")
    val ltRow = lt.head()
    assert(ltRow.getAs[Long]("rows_total") == 300L)
    val nLarge = ltRow.getAs[Long]("rows_large")
    assert(nLarge >= 1 && nLarge <= 50, s"rows_large=$nLarge")
    val topRows = ltRow.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top_rows")
    assert(topRows.size == nLarge.toInt) // 0.995 quantile of 300 rows < topN=50
    val notionals = topRows.map(_.getAs[Double]("notional"))
    assert(notionals.sliding(2).forall(p => p.size < 2 || p(0) >= p(1)),
      "top_rows not sorted by notional desc")
    assert(notionals.min >= ltRow.getAs[Double]("threshold_notional"))

    // Orderbook report: best bid/ask from the synthetic fixture's known
    // ladder (bids descend from 99.9, asks ascend from 100.1).
    val ob = spark.read.json(s"$out/summary_orderbook.json").head()
    assert(ob.getAs[Long]("rows_total") == 60L)
    assert(math.abs(ob.getAs[Double]("best_bid") - 99.9) < 1e-9)
    assert(math.abs(ob.getAs[Double]("best_ask") - 100.1) < 1e-9)
    assert(math.abs(ob.getAs[Double]("spread") - 0.2) < 1e-9)
    assert(math.abs(ob.getAs[Double]("mid") - 100.0) < 1e-9)
    // depth_top20_bid_qty = Σ_{id=0..19} (1 + id/10) = 39.0, same ladder asks
    assert(math.abs(ob.getAs[Double]("depth_top20_bid_qty") - 39.0) < 1e-9)
    assert(math.abs(ob.getAs[Double]("depth_top20_ask_qty") - 39.0) < 1e-9)
    assert(ob.getAs[Double]("depth_top20_bid_notional") > 0)
    assert(ob.getAs[Double]("depth_top20_ask_notional") > 0)
  }

  test("analyze without trades/book emits no trades/orderbook artifacts") {
    val candles = Synthetic.offlineKlines(spark, "AAA", "1m", 40, 1704072600L)
    val out = Files.createTempDirectory("analyze-min").toString
    Analyze.run(spark, candles, out, focusSymbol = Some("AAA"))
    assert(!Files.exists(Paths.get(out, "summary_large_trades.json")))
    assert(!Files.exists(Paths.get(out, "summary_orderbook.json")))
    assert(Files.isDirectory(Paths.get(out, "vol_vs_volume_sample")))
  }
}
