package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("klines CSV: sniffed timestamps, filename-derived symbol/tf, alias default") {
    val dir = Files.createTempDirectory("klines")
    // ms-epoch times, no symbol/tf columns, no trades-count column at all.
    Files.writeString(dir.resolve("klines_BTCUSDT_1m.csv"),
      """open_time,open,high,low,close,volume
        |1704067200000,42000,42100,41900,42050,10.5
        |1704067260000,42050,42200,42000,42150,8.25
        |""".stripMargin)
    // ISO times + 'trades' alias for num_trades, symbol column present.
    Files.writeString(dir.resolve("klines_ETHUSDT_1m.csv"),
      """open_time,open,high,low,close,volume,trades,symbol,tf
        |2024-01-01 00:00:00,2200,2210,2190,2205,100,37,ETHUSDT,1m
        |2024-01-01 00:01:00,2205,2220,2200,2215,90,21,ETHUSDT,1m
        |""".stripMargin)
    val df = CsvReaders.readKlinesCsv(spark, dir.toString + "/klines_*.csv")
    assert(df.count() == 4)
    val bySym = df.orderBy("symbol", "open_time")
      .select("symbol", "tf", "num_trades").as[(String, String, Long)].collect()
    assert(bySym.count(_._1 == "BTCUSDT") == 2)
    assert(bySym.filter(_._1 == "BTCUSDT").forall(r => r._2 == "1m" && r._3 == 0L))
    assert(bySym.filter(_._1 == "ETHUSDT").map(_._3).toSeq == Seq(37L, 21L))
    // both timestamp formats landed on the same UTC instants
    val times = df.where(col("symbol") === "BTCUSDT")
      .select(date_format(col("open_time"), "yyyy-MM-dd HH:mm:ss")).as[String].collect().sorted
    assert(times.head == "2024-01-01 00:00:00")
  }

  test("klines CSV: bad numerics coerce to null and required-drop applies") {
    val dir = Files.createTempDirectory("klines2")
    Files.writeString(dir.resolve("klines_XRPUSDT_5m.csv"),
      """open_time,open,high,low,close,volume
        |1704067200000,1.0,1.1,0.9,not_a_number,5
        |1704067500000,1.0,1.1,0.9,1.05,bad_volume
        |""".stripMargin)
    val df = CsvReaders.readKlinesCsv(spark, dir.toString + "/klines_*.csv")
    // row 1 dropped (close null); row 2 kept with null volume
    assert(df.count() == 1)
    assert(df.select("volume").head().isNullAt(0))
  }

  test("orderbook CSV: side normalization + CHECK filter") {
    val dir = Files.createTempDirectory("book")
    Files.writeString(dir.resolve("orderbook_BTCUSDT.csv"),
      """symbol,price,qty,side,update_id,update_time
        |BTCUSDT,42000,1.5, BID ,7,1704067200000
        |BTCUSDT,42010,0.5,ask,7,1704067200000
        |BTCUSDT,42005,0.1,mid,7,1704067200000
        |""".stripMargin)
    val df = CsvReaders.readOrderbookCsv(spark, dir.toString + "/orderbook_*.csv")
    assert(df.count() == 2)
    assert(df.select("side").as[String].collect().toSet == Set("bid", "ask"))
  }

  test("uniform-header kline fleets collapse to one multi-path scan") {
    val dir = Files.createTempDirectory("fleet")
    Seq("BTCUSDT" -> "42000", "ETHUSDT" -> "2200", "XRPUSDT" -> "1").foreach {
      case (sym, px) =>
        Files.writeString(dir.resolve(s"klines_${sym}_1m.csv"),
          s"""open_time,open,high,low,close,volume
             |1704067200000,$px,$px,$px,$px,10
             |1704067260000,$px,$px,$px,$px,11
             |""".stripMargin)
    }
    val df = CsvReaders.readKlinesCsv(spark, dir.toString + "/klines_*.csv")
    assert(df.count() == 6)
    assert(df.select("symbol").distinct().count() == 3)
    // ONE FileScan node — the plan must not grow with the file count.
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1, s"expected 1 scan, got ${scans.length}")
    assert(scans.head.relation.location.inputFiles.length == 3)
  }

  test("mixed-header kline fleets read one scan per distinct header") {
    val dir = Files.createTempDirectory("fleet2")
    Files.writeString(dir.resolve("klines_AAAUSDT_1m.csv"),
      """open_time,open,high,low,close,volume
        |1704067200000,1,1,1,1,10
        |""".stripMargin)
    Files.writeString(dir.resolve("klines_BBBUSDT_1m.csv"),
      """open_time,open,high,low,close,volume,trades
        |1704067200000,2,2,2,2,10,5
        |""".stripMargin)
    Files.writeString(dir.resolve("klines_CCCUSDT_1m.csv"),
      """open_time,open,high,low,close,volume,trades
        |1704067200000,3,3,3,3,10,7
        |""".stripMargin)
    val df = CsvReaders.readKlinesCsv(spark, dir.toString + "/klines_*.csv")
    assert(df.count() == 3)
    val got = df.orderBy("symbol").select("symbol", "num_trades")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("AAAUSDT", 0L), ("BBBUSDT", 5L), ("CCCUSDT", 7L)))
    // two distinct headers → exactly two scans (NOT three)
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 2, s"expected 2 scans, got ${scans.length}")
  }

  test("trades/orderbook ingest carries NUMERIC(20,8) exactness to storage") {
    import org.apache.spark.sql.types.DecimalType
    val dir = Files.createTempDirectory("decimals")
    // 8-dp values chosen to NOT be exactly representable as binary doubles.
    Files.writeString(dir.resolve("trades_BTCUSDT.csv"),
      """symbol,trade_id,price,qty,quote_qty,trade_time,is_buyer_maker,is_best_match
        |BTCUSDT,1,42000.10000001,0.30000001,12600.07200001,1704067200000,true,true
        |""".stripMargin)
    val trades = CsvReaders.readTradesCsv(spark, dir.toString + "/trades_*.csv")
    Seq("price", "qty", "quote_qty").foreach { c =>
      assert(trades.schema(c).dataType == DecimalType(20, 8), s"$c not NUMERIC(20,8)")
    }
    val row = trades.select("price", "qty", "quote_qty").head()
    assert(row.getDecimal(0) == new java.math.BigDecimal("42000.10000001"))
    assert(row.getDecimal(1) == new java.math.BigDecimal("0.30000001"))
    assert(row.getDecimal(2) == new java.math.BigDecimal("12600.07200001"))

    Files.writeString(dir.resolve("orderbook_BTCUSDT.csv"),
      """symbol,price,qty,side,update_id,update_time
        |BTCUSDT,42000.00000003,1.50000007,bid,7,1704067200000
        |""".stripMargin)
    val book = CsvReaders.readOrderbookCsv(spark, dir.toString + "/orderbook_*.csv")
    Seq("price", "qty").foreach { c =>
      assert(book.schema(c).dataType == DecimalType(20, 8), s"$c not NUMERIC(20,8)")
    }
    assert(book.select("price").head().getDecimal(0) ==
      new java.math.BigDecimal("42000.00000003"))

    // And the warehouse parquet written by the ETL upsert keeps the type.
    val wh = Files.createTempDirectory("wh").toString
    graft.EtlLoader.loadAll(spark, dir.toString, wh)
    val stored = graft.operators.UpsertWriter.read(spark, s"$wh/trades").get
    assert(stored.schema("price").dataType == DecimalType(20, 8))
    assert(stored.select("price").head().getDecimal(0) ==
      new java.math.BigDecimal("42000.10000001"))
  }

  test("offline synthetic klines are deterministic and minute-spaced") {
    val a = Synthetic.offlineKlines(spark, "TEST", "1m", 10, 1704070000L)
    val b = Synthetic.offlineKlines(spark, "TEST", "1m", 10, 1704070000L)
    assert(a.collect().toSeq == b.collect().toSeq)
    val ts = a.select(unix_timestamp(col("open_time"))).as[Long].collect().sorted
    assert(ts.sliding(2).forall(p => p(1) - p(0) == 60))
    assert(a.where(col("close") =!= 1.0).count() == 0)
  }
}
