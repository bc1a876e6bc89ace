package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.DepthFlatten
import graft.sources.Readers

class SinksAndFlattenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("depth snapshot flattens to bid/ask level rows") {
    val snap = Seq(
      ("BTCUSDT", 7L, Seq(Seq("42000", "1.5"), Seq("41990", "2.0")),
        Seq(Seq("42010", "0.5"), Seq("bad", "x")))
    ).toDF("symbol", "update_id", "bids", "asks")
      .withColumn("update_time", timestamp_seconds(lit(1704067200L)))
    val flat = DepthFlatten.flatten(snap)
    val rows = flat.orderBy("side", "price")
      .select("side", "price", "qty").as[(String, Double, Double)].collect().toSeq
    // malformed ask pair coerces to null and is dropped
    assert(rows == Seq(("ask", 42010.0, 0.5), ("bid", 41990.0, 2.0), ("bid", 42000.0, 1.5)))
  }

  test("csv artifact: header + ISO timestamp rendering + single file") {
    val dir = Files.createTempDirectory("art").toString + "/out"
    val df = Seq(("BTCUSDT", 42000.0)).toDF("symbol", "price")
      .withColumn("open_time", timestamp_seconds(lit(1704067200L)))
    Artifacts.writeCsv(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = Files.readAllLines(files.head.toPath)
    assert(lines.get(0) == "symbol,price,open_time")
    assert(lines.get(1).contains("2024-01-01 00:00:00"))
  }

  test("json summary artifact round-trips through the S11 reader") {
    val path = Files.createTempDirectory("art2").toString + "/summary.json"
    val df = Seq((42000.5, 123L)).toDF("avg_price", "n")
    Artifacts.writeJsonSummary(df, path)
    val back = Readers.readJsonArtifact(spark, path)
    val row = back.select("avg_price", "n").as[(Double, Long)].head()
    assert(row == ((42000.5, 123L)))
  }

  test("source router dispatches on data_source and pushes filters") {
    val dir = Files.createTempDirectory("cand").toString + "/candles"
    import graft.sources.Synthetic
    Synthetic.offlineKlines(spark, "AAA", "1m", 5, 1704070000L)
      .unionByName(Synthetic.offlineKlines(spark, "BBB", "1m", 5, 1704070000L))
      .write.parquet(dir)
    val src = Readers.candlesSource(Map("data_source" -> "parquet", "parquet_path" -> dir))
    val df = Readers.loadCandles(spark, src, "1m", Seq("AAA"))
    assert(df.select("symbol").distinct().as[String].collect().toSeq == Seq("AAA"))
    assert(Readers.distinctSymbols(spark.read.parquet(dir), "1m")
      .as[String].collect().toSeq == Seq("AAA", "BBB"))
    // filters reach the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("symbol"))
  }
}
