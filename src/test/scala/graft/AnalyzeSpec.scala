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
    Analyze.run(spark, candles, out, focusSymbol = Some("AAA"))
    val expected = Seq("metrics_summary", "daily_summary", "monthly_volume",
      "hourly_profile", "dow_profile", "heatmap_absret", "heatmap_volume",
      "anomalies_top")
    expected.foreach { d =>
      assert(Files.isDirectory(Paths.get(out, d)), s"missing artifact dir $d")
      val n = spark.read.option("header", "true").csv(s"$out/$d").count()
      assert(n > 0, s"empty artifact $d")
    }
    Seq("summary_correlation.json", "summary_overall.json", "summary_coverage.json")
      .foreach { fjson =>
        assert(Files.exists(Paths.get(out, fjson)), s"missing $fjson")
        assert(Files.readString(Paths.get(out, fjson)).startsWith("{"))
      }
    // metrics has one row per symbol, ordered
    val m = spark.read.option("header", "true").csv(s"$out/metrics_summary")
    assert(m.select("symbol").collect().map(_.getString(0)).toSeq == Seq("AAA", "BBB"))
  }
}
