package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class StreamDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Reference: key "m", values spread uniformly over buckets 0 and 1
  // (width 10): p_ref = (0.5, 0.5).
  private lazy val ref = Seq.tabulate(40)(i => ("m", (i % 2) * 10.0 + 1.0))
    .toDF("metric", "value")

  test("batch path: identical distribution scores PSI 0, shifted one alerts") {
    val hist = StreamDrift.referenceHistogram(ref, "metric", "value", 10.0)
    // Live window 1 matches the reference split exactly; window 2 is
    // heavily shifted to bucket 0 (15 of 16 in bucket 0).
    val live = (Seq.tabulate(20)(i => ("m", "2024-01-01 00:00:01", (i % 2) * 10.0 + 2.0)) ++
        Seq.tabulate(16)(i => ("m", "2024-01-01 00:01:01",
          if (i < 15) 2.0 else 12.0)))
      .toDF("metric", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val got = StreamDrift.windowedPsi(live, "metric", "ts", "value", hist,
        10.0, "1 minute", "0 seconds")
      .orderBy("window_start")
      .select("n_buckets", "psi", "drift_alert")
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got.size == 2)
    assert(got(0) == ((2L, 0.0, false)), s"matching window scored ${got(0)}")
    val (nb2, psi2, alert2) = got(1)
    // Hand value: p_live=(15/16,1/16), p_ref=(.5,.5):
    // (0.9375-0.5)ln(1.875) + (0.0625-0.5)ln(0.125) = 0.275016 + 0.909756
    assert(nb2 == 2L && alert2, s"shifted window scored ${got(1)}")
    assert(math.abs(psi2 - 1.184772) < 1e-6)
  }

  test("streaming: windows score against the broadcast reference and finalize once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val hist = StreamDrift.referenceHistogram(ref, "metric", "value", 10.0)
    val mem = MemoryStream[(String, String, Double)]
    val stream = mem.toDF().toDF("metric", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val scored = StreamDrift.windowedPsi(stream, "metric", "ts", "value", hist,
      10.0, "1 minute", "1 minute")
    val q = scored.writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      // A balanced minute (PSI 0) ...
      (0 until 20).foreach(i =>
        mem.addData(("m", "2024-01-01 00:00:01", (i % 2) * 10.0 + 2.0)))
      q.processAllAvailable()
      assert(spark.table("drift_out").count() == 0,
        "window emitted before the watermark closed it")
      // ... then a shifted minute, then an event far ahead to close both.
      (0 until 16).foreach(i =>
        mem.addData(("m", "2024-01-01 00:01:01", if (i < 15) 2.0 else 12.0)))
      mem.addData(("m", "2024-01-01 00:30:00", 2.0))
      q.processAllAvailable()
      val got = spark.table("drift_out").orderBy("window_start")
        .select("psi", "drift_alert").as[(Double, Boolean)].collect().toSeq
      assert(got.size == 2)
      assert(got(0) == ((0.0, false)))
      assert(math.abs(got(1)._1 - 1.184772) < 1e-6 && got(1)._2)
    } finally q.stop()
  }

  test("buckets unseen in the reference stay in the window total (q96 convention)") {
    val hist = StreamDrift.referenceHistogram(ref, "metric", "value", 10.0)
    val live = Seq(("m", "2024-01-01 00:00:01", 55.0), // bucket 5: not in ref
        ("m", "2024-01-01 00:00:02", 2.0),
        ("m", "2024-01-01 00:00:03", 12.0))
      .toDF("metric", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val got = StreamDrift.windowedPsi(live, "metric", "ts", "value", hist,
        10.0, "1 minute", "0 seconds")
      .select("n_buckets", "psi").as[(Long, Double)].head()
    // The novel bucket contributes no log term (n_buckets = 2) but DOES
    // stay in the live total: p_live = (1/3, 1/3) vs (0.5, 0.5) →
    // 2 · (1/3 − 1/2)·ln((1/3)/(1/2)) = 0.135155.
    assert(got._1 == 2L)
    assert(math.abs(got._2 - 0.135155) < 1e-6)
  }

  test("a window dominated by never-before-seen buckets ALERTS") {
    // The regression that motivated the full-distribution denominator: 98
    // of 100 events land in a bucket the reference never saw, 1 each in
    // the matched buckets. Renormalizing over matched buckets only would
    // score p_live = (0.5, 0.5) = p_ref → PSI 0 and silently miss maximal
    // drift; the q96 convention keeps the novel mass in the denominator.
    val hist = StreamDrift.referenceHistogram(ref, "metric", "value", 10.0)
    val live = (Seq.fill(98)(("m", "2024-01-01 00:00:01", 55.0)) ++
        Seq(("m", "2024-01-01 00:00:02", 2.0), ("m", "2024-01-01 00:00:03", 12.0)))
      .toDF("metric", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val got = StreamDrift.windowedPsi(live, "metric", "ts", "value", hist,
        10.0, "1 minute", "0 seconds")
      .select("psi", "drift_alert").as[(Double, Boolean)].head()
    // 2 · (0.01 − 0.5)·ln(0.01/0.5) = 2 · (−0.49)·(−3.912023) = 3.833783
    assert(math.abs(got._1 - 3.833783) < 1e-6 && got._2)
  }
}
