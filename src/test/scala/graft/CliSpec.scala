package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Rest

/** End-to-end smoke per CLI subcommand (the reference's
  * tests/test_main.py:16-18 shape): OFFLINE-style synthetic/fake-transport
  * source → CSV artifact → ETL dispatch back into warehouse tables. */
class CliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixedNowMs = 1704067200000L // 2024-01-01T00:00:00Z

  test("parseArgs: subcommand + --key value pairs") {
    val o = Main.parseArgs(Array("collect-klines", "--pairs", "btcusdt, ethusdt",
      "--tf", "5m", "--days", "2"))
    assert(o.cmd.contains("collect-klines"))
    assert(Main.parsePairs(o.get("pairs", "")) == Seq("BTCUSDT", "ETHUSDT"))
    assert(o.get("tf", "1m") == "5m" && o.get("days", "1") == "2")
    assert(Main.parseArgs(Array.empty).cmd.isEmpty)
    // Dangling or value-less flags fail loudly instead of shifting pairs.
    intercept[IllegalArgumentException] {
      Main.parseArgs(Array("etl", "--data", "d", "--warehouse"))
    }
    intercept[RuntimeException] {
      Main.parseArgs(Array("analyze", "--focus", "--out", "x"))
    }
    // Env fallback is whitelisted: only the reference's variables apply.
    assert(Main.parseArgs(Array("etl")).get("data", "data") == "data")
    // analyze's optional trades/book inputs parse as plain flags.
    val a = Main.parseArgs(Array("analyze", "--in", "k.csv",
      "--trades", "t.csv", "--book", "b.parquet"))
    assert(a.kv.get("trades").contains("t.csv"))
    assert(a.kv.get("book").contains("b.parquet"))
  }

  test("price-ticks online path parses and rounds via fake transport") {
    var calls = 0
    val transport: Rest.Transport = _ => {
      calls += 1
      Right(s"""{"symbol":"BTCUSDT","price":"42000.12${calls}9"}""")
    }
    val vals = Main.priceTicks(3, 0, transport, Seq("http://h"), off = false)
    assert(vals.size == 3 && calls == 3)
    assert(vals.forall(v => (v * 100) == math.floor(v * 100))) // 2-dp rounded
  }

  test("collect-klines (fake transport) paginates and writes the artifact") {
    // 1500 one-minute bars forces >1 page at limit 1000 — the pagination
    // fix the reference lacks.
    val t0 = fixedNowMs - 1500L * 60000
    val transport: Rest.Transport = url => {
      val q = url.split('?')(1).split('&').map(_.split('=')).map(a => a(0) -> a(1)).toMap
      val start = q("startTime").toLong; val end = q("endTime").toLong
      val limit = q("limit").toInt
      val bars = Iterator.iterate(math.max(start, t0))(_ + 60000)
        .takeWhile(_ < end).take(limit)
        .map(ms => s"""[$ms,"1.0","2.0","0.5","1.5","10.0",0,"0",7]""")
      Right(bars.mkString("[", ",", "]"))
    }
    val out = Files.createTempDirectory("cli-klines").toString
    val paths = Main.collectKlines(spark, Seq("BTCUSDT"), "1m", 1, out,
      transport, Seq("http://h"), fixedNowMs, off = false)
    assert(paths == Seq(s"$out/klines_BTCUSDT_1m.csv"))
    val back = spark.read.option("header", "true").csv(paths.head)
    assert(back.count() == 1440) // one day of minutes, not truncated at 1000
    assert(back.columns.toSeq == Seq("symbol", "tf", "open_time", "open",
      "high", "low", "close", "volume", "num_trades"))
  }

  test("collect-trades and collect-orderbooks (fake transport) write artifacts") {
    val tradesBody =
      """[{"id":1,"price":"100.5","qty":"2.0","quoteQty":"201.0",
         "time":1704067200000,"isBuyerMaker":true,"isBestMatch":true},
         {"id":2,"price":"101.0","qty":"1.0","quoteQty":"101.0",
         "time":1704067201000,"isBuyerMaker":false,"isBestMatch":true}]"""
    val depthBody =
      """{"lastUpdateId":77,"bids":[["99.9","1.0"],["99.8","2.0"]],
         "asks":[["100.1","1.5"]]}"""
    val transport: Rest.Transport = url =>
      Right(if (url.contains("/trades")) tradesBody else depthBody)
    val out = Files.createTempDirectory("cli-td").toString
    Main.collectTrades(spark, Seq("AAA"), out, transport, Seq("http://h"),
      fixedNowMs, off = false)
    Main.collectOrderbooks(spark, Seq("AAA"), out, transport, Seq("http://h"),
      fixedNowMs, off = false)
    val tr = spark.read.option("header", "true").csv(s"$out/trades_AAA.csv")
    assert(tr.count() == 2)
    assert(tr.columns.toSeq == Seq("symbol", "trade_id", "price", "qty",
      "quote_qty", "trade_time", "is_buyer_maker", "is_best_match"))
    val ob = spark.read.option("header", "true").csv(s"$out/orderbook_AAA.csv")
    assert(ob.count() == 3)
    assert(ob.where(col("side") === "bid").count() == 2)
  }

  test("etl glob dispatcher routes collected artifacts to keyed tables") {
    val data = Files.createTempDirectory("cli-etl-data").toString
    val wh = Files.createTempDirectory("cli-etl-wh").toString
    // Synthetic collected artifacts (the OFFLINE path of each collector).
    sinks.Artifacts.writeCsv(
      sources.Synthetic.offlineKlines(spark, "AAA", "1m", 10, fixedNowMs / 1000),
      s"$data/klines_AAA_1m.csv")
    sinks.Artifacts.writeCsv(
      sources.Synthetic.syntheticTrades(spark, "AAA", 50, fixedNowMs / 1000)
        .withColumn("quote_qty", round(col("price") * col("qty"), 8))
        .withColumn("is_best_match", lit(true)),
      s"$data/trades_AAA.csv")
    sinks.Artifacts.writeCsv(
      sources.Synthetic.syntheticDepth(spark, "AAA", 4, fixedNowMs / 1000),
      s"$data/orderbook_AAA.csv")
    Files.writeString(java.nio.file.Paths.get(s"$data/notes.csv"), "a,b\n1,2\n")

    val log = EtlLoader.loadAll(spark, data, wh).toMap
    assert(log("klines_AAA_1m.csv") == "candles")
    assert(log("trades_AAA.csv") == "trades")
    assert(log("orderbook_AAA.csv") == "order_books")
    assert(log("notes.csv") == "skipped")
    assert(operators.UpsertWriter.read(spark, s"$wh/candles").get.count() == 10)
    assert(operators.UpsertWriter.read(spark, s"$wh/trades").get.count() == 50)
    assert(operators.UpsertWriter.read(spark, s"$wh/order_books").get.count() == 8)

    // Idempotency: re-running the whole dispatch changes nothing (K4).
    EtlLoader.loadAll(spark, data, wh)
    assert(operators.UpsertWriter.read(spark, s"$wh/candles").get.count() == 10)
    assert(operators.UpsertWriter.read(spark, s"$wh/trades").get.count() == 50)

    // status subcommand (app.py:114-124 panel): count + covered period of
    // the warehouse table as one JSON line; a missing table reports
    // available:false instead of failing (the panel's warning branch).
    val st = Main.status(spark, wh, "candles")
    assert(st.contains(""""table":"candles""""), st)
    assert(st.contains(""""available":true"""), st)
    assert(st.contains(""""n":10"""), st)
    assert(st.contains(""""min_ts":""") && st.contains(""""max_ts":"""), st)
    val expMin = operators.UpsertWriter.read(spark, s"$wh/candles").get
      .agg(org.apache.spark.sql.functions.min(col("open_time"))).first().get(0)
    assert(st.contains(s""""min_ts":"$expMin""""), s"$st vs $expMin")
    assert(Main.status(spark, wh, "trades").contains(""""n":50"""))
    assert(Main.status(spark, wh, "no_such_table")
      .contains(""""available":false"""))
  }
}
