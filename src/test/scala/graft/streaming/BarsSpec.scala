package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.UpsertWriter
import graft.sources.Synthetic

class BarsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("oneMinuteBars (batch parity): OHLCV matches hand aggregation") {
    val trades = Seq(
      ("S", "2024-01-01 00:00:05", 10.0, 1.0),
      ("S", "2024-01-01 00:00:30", 12.0, 2.0),
      ("S", "2024-01-01 00:00:55", 11.0, 1.0),
      ("S", "2024-01-01 00:01:10", 13.0, 0.5))
      .toDF("symbol", "t", "price", "qty")
      .withColumn("trade_time", to_timestamp(col("t"))).drop("t")
    val bars = Bars.oneMinuteBars(trades).orderBy("open_time")
      .select("open", "high", "low", "close", "volume", "num_trades")
      .as[(Double, Double, Double, Double, Double, Long)].collect().toSeq
    assert(bars == Seq((10.0, 12.0, 10.0, 11.0, 4.0, 3L), (13.0, 13.0, 13.0, 13.0, 0.5, 1L)))
  }

  test("ticker micro-poll fetches per batch and upserts idempotently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.Rest
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    var fetches = 0
    val transport: Rest.Transport = url => {
      fetches += 1
      if (url.contains("host-a")) Left(429) // first host throttled
      else Right(s"""{"symbol":"BTCUSDT","price":"${42000 + fetches}.5"}""")
    }
    val table = java.nio.file.Files.createTempDirectory("ticks").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tick-ckpt").toString
    val mem = MemoryStream[Long]
    val q = Ticker.pollingWriter(mem.toDF(), Seq("http://host-a", "http://host-b"),
      "BTCUSDT", transport, table, ckpt).start()
    try {
      mem.addData(1L); q.processAllAvailable()
      mem.addData(2L); q.processAllAvailable()
    } finally q.stop()
    val ticks = graft.operators.UpsertWriter.read(spark, table).get
      .orderBy("poll_id").select("symbol", "poll_id", "price")
      .as[(String, Long, Double)].collect().toSeq
    assert(ticks.size == 2)
    assert(ticks.forall(_._1 == "BTCUSDT"))
    assert(fetches >= 4) // each poll tried host-a (throttled) then host-b
  }

  test("production rate-source trigger path starts and polls (S6)") {
    import graft.sources.Rest
    val transport: Rest.Transport = _ =>
      Right("""{"symbol":"ETHUSDT","price":"2500.25"}""")
    val table = Files.createTempDirectory("rate-ticks").toString
    val ckpt = Files.createTempDirectory("rate-ckpt").toString
    // The real trigger: rate source (integer rowsPerSecond) + ProcessingTime
    // cadence. The round-1 fractional rowsPerSecond threw NumberFormatException
    // here at stream start.
    val q = Ticker.pollingQuery(spark, Seq("http://host"), "ETHUSDT",
      transport, table, ckpt, intervalSec = 1).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = UpsertWriter.read(spark, table).map(_.count()).getOrElse(0L)
      }
      assert(n > 0, "rate-trigger stream produced no ticks within 30s")
    } finally q.stop()
  }

  test("upsert GCs superseded generations (keeps current + previous)") {
    val table = Files.createTempDirectory("gen-gc").toString
    (1 to 4).foreach { i =>
      val batch = Seq(("S", i.toLong, i * 1.0)).toDF("symbol", "poll_id", "price")
      UpsertWriter.upsert(spark, batch, table, Seq("symbol", "poll_id"),
        retainMillis = 0L)
    }
    val gens = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
    assert(gens.length <= 2, s"leaked generations: ${gens.map(_.getName).toSeq}")
    assert(UpsertWriter.read(spark, table).get.count() == 4)
  }

  test("upsert retention window protects in-flight readers of aged gens") {
    val table = Files.createTempDirectory("gen-retain").toString
    (1 to 4).foreach { i =>
      val batch = Seq(("S", i.toLong, i * 1.0)).toDF("symbol", "poll_id", "price")
      UpsertWriter.upsert(spark, batch, table, Seq("symbol", "poll_id"))
    }
    // Default 60 s retention: the three superseded generations are all
    // younger than the window, so a reader holding any of them can finish.
    val gens = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
    assert(gens.length == 4, s"young generations GC'd: ${gens.map(_.getName).toSeq}")
    assert(UpsertWriter.read(spark, table).get.count() == 4)
  }

  test("streaming micro-batches upsert into the bar table idempotently") {
    val src = Files.createTempDirectory("stream-src")
    val table = Files.createTempDirectory("bar-table").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val trades = Synthetic.syntheticTrades(spark, "AAA", 300, 1704067200L)
    trades.write.mode("overwrite").parquet(src.toString + "/batch1")

    val stream = spark.readStream.schema(trades.schema)
      .parquet(src.toString + "/*")
      .select("symbol", "trade_time", "price", "qty")
    val q = Bars.upsertingWriter(Bars.oneMinuteBars(stream), table, ckpt).start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = UpsertWriter.read(spark, table).get
    val expected = Bars.oneMinuteBars(trades.select("symbol", "trade_time", "price", "qty"))
    assert(got.count() == expected.count())
    // bar for the first minute matches the batch computation exactly
    val g1 = got.orderBy("open_time").select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Double)].head()
    val e1 = expected.orderBy("open_time").select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(g1 == e1)
  }

  test("bucketed streaming sink matches the full-rewrite sink's table state") {
    val src = Files.createTempDirectory("bstream-src")
    val table = Files.createTempDirectory("bbar-table").toString
    val ckpt = Files.createTempDirectory("bckpt").toString
    val trades = Synthetic.syntheticTrades(spark, "AAA", 300, 1704067200L)
    trades.write.mode("overwrite").parquet(src.toString + "/batch1")

    val stream = spark.readStream.schema(trades.schema)
      .parquet(src.toString + "/*")
      .select("symbol", "trade_time", "price", "qty")
    val q = Bars.bucketedUpsertingWriter(
      Bars.oneMinuteBars(stream), table, ckpt, numBuckets = 8).start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = graft.operators.BucketedUpsertWriter.read(spark, table).get
    val expected = Bars.oneMinuteBars(trades.select("symbol", "trade_time", "price", "qty"))
    assert(got.count() == expected.count())
    val g1 = got.orderBy("open_time").select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Double)].head()
    val e1 = expected.orderBy("open_time").select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(g1 == e1)
  }

  test("auto-routed streaming sink: default hint pins bucketed even for a bulk-shaped first batch") {
    val src = Files.createTempDirectory("astream-src")
    val table = Files.createTempDirectory("abar-table").toString
    val ckpt = Files.createTempDirectory("ackpt").toString
    // A full hour of trades in ONE file = the restart-against-accumulated-
    // backlog shape: the first trigger replays ~60 bar keys as one bulk
    // batch, which first-batch SNIFFING would route FullRewrite — pinning
    // a steady-state trickle stream to the wrong layout forever
    // (ADVICE-r13). The streaming writer's default Bucketed hint must win.
    val trades = Synthetic.syntheticTrades(spark, "AAA", 3600, 1704067200L)
    trades.write.mode("overwrite").parquet(src.toString + "/batch1")

    val stream = spark.readStream.schema(trades.schema)
      .parquet(src.toString + "/*")
      .select("symbol", "trade_time", "price", "qty")
    val q = Bars.autoUpsertingWriter(
      Bars.oneMinuteBars(stream), table, ckpt, numBuckets = 32).start()
    try { q.processAllAvailable() } finally { q.stop() }

    assert(graft.operators.UpsertRouter.existingRoute(table)
      .contains(graft.operators.UpsertRouter.Bucketed),
      "bulk first batch must not override the streaming default Bucketed hint")
    val got = graft.operators.UpsertRouter.read(spark, table).get
    val expected = Bars.oneMinuteBars(trades.select("symbol", "trade_time", "price", "qty"))
    assert(got.count() == expected.count())
    val g1 = got.orderBy("open_time").select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Double)].head()
    val e1 = expected.orderBy("open_time").select("open", "high", "low", "close", "volume")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(g1 == e1)
  }

  test("auto-routed streaming sink: layoutHint=None opts back into first-batch sniffing") {
    val src = Files.createTempDirectory("sstream-src")
    val table = Files.createTempDirectory("sbar-table").toString
    val ckpt = Files.createTempDirectory("sckpt").toString
    // 300 s of one symbol = ~5 bar keys: trickle-shaped, the estimator
    // itself must route bucketed (the bulk→FullRewrite sniffing leg is
    // covered batch-side in UpsertRouterSpec).
    val trades = Synthetic.syntheticTrades(spark, "AAA", 300, 1704067200L)
    trades.write.mode("overwrite").parquet(src.toString + "/batch1")
    val stream = spark.readStream.schema(trades.schema)
      .parquet(src.toString + "/*")
      .select("symbol", "trade_time", "price", "qty")
    val q = Bars.autoUpsertingWriter(Bars.oneMinuteBars(stream), table, ckpt,
      numBuckets = 32, layoutHint = None).start()
    try { q.processAllAvailable() } finally { q.stop() }
    assert(graft.operators.UpsertRouter.existingRoute(table)
      .contains(graft.operators.UpsertRouter.Bucketed),
      "trickle first batch under sniffing should route bucketed")
  }
}
