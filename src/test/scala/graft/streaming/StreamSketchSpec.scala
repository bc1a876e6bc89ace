package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.Sketches

class StreamSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  // Two minutes of traffic: minute 0 has "a"×5, "b"×3; minute 1 has "a"×2,
  // "c"×7. Watchlist watches a, b, c and one absent key.
  private def events: Seq[(String, String)] =
    Seq.fill(5)(("a", "2024-01-01 00:00:01")) ++
      Seq.fill(3)(("b", "2024-01-01 00:00:30")) ++
      Seq.fill(2)(("a", "2024-01-01 00:01:10")) ++
      Seq.fill(7)(("c", "2024-01-01 00:01:40"))

  private def watch = Seq("a", "b", "c", "ghost").toDF("k")

  test("batch path: windowed estimates are >= exact per-window counts and match the batch CMS") {
    val df = events.toDF("k", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val cms = StreamSketch.windowedCms(df, "k", "ts", D, W, "1 minute", "0 seconds")
    val est = StreamSketch.windowedEstimates(cms, watch, "k", D, W)
      .select($"window_start".cast("string"), $"k", $"est")
      .as[(String, String, Long)].collect()
      .map { case (w, k, e) => (w, k) -> e }.toMap
    val exact = Map(
      ("2024-01-01 00:00:00", "a") -> 5L, ("2024-01-01 00:00:00", "b") -> 3L,
      ("2024-01-01 00:01:00", "a") -> 2L, ("2024-01-01 00:01:00", "c") -> 7L)
    exact.foreach { case (key, n) =>
      assert(est.contains(key), s"missing estimate for $key")
      assert(est(key) >= n, s"$key: est ${est(key)} < exact $n")
    }
    // absent keys emit nothing (absence reads as 0)
    assert(!est.keys.exists(_._2 == "ghost"))
    assert(!est.contains(("2024-01-01 00:00:00", "c")))
    // per-window counters agree with the batch cmsTable over that window's rows
    val w0 = events.filter(_._2.startsWith("2024-01-01 00:00:"))
      .groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }.toSeq
    val batch = Sketches.cmsTable(w0.toDF("k", "cnt"), "k", "cnt", D, W)
      .select($"seed", $"bucket", $"total").as[(Int, Long, Long)].collect().toSet
    val live = cms.where($"window.start".cast("string") === "2024-01-01 00:00:00")
      .select($"seed", $"bucket", $"total").as[(Int, Long, Long)].collect().toSet
    assert(live == batch, s"live window counters diverge from batch CMS:\n$live\nvs\n$batch")
  }

  test("streaming: counters finalize once per window and estimates match the batch path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF().toDF("k", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val cms = StreamSketch.windowedCms(stream, "k", "ts", D, W, "1 minute", "1 minute")
    val est = StreamSketch.windowedEstimates(cms, watch, "k", D, W)
    val q = est.writeStream.format("memory").queryName("sketch_out")
      .outputMode("append").start()
    try {
      events.foreach(mem.addData(_))
      q.processAllAvailable()
      assert(spark.table("sketch_out").count() == 0,
        "windows emitted before the watermark closed them")
      mem.addData(("a", "2024-01-01 00:30:00")) // advance watermark past both
      q.processAllAvailable()
      val got = spark.table("sketch_out")
        .select($"window_start".cast("string"), $"k", $"est")
        .as[(String, String, Long)].collect().sorted.toSeq
      // exactly one row per (window, key) — finalize-once
      assert(got.map(r => (r._1, r._2)).distinct.size == got.size)
      // identical to running the batch path over the same closed windows
      val batchDf = events.toDF("k", "t")
        .withColumn("ts", to_timestamp(col("t"))).drop("t")
      val want = StreamSketch.windowedEstimates(
          StreamSketch.windowedCms(batchDf, "k", "ts", D, W, "1 minute", "0 seconds"),
          watch, "k", D, W)
        .select($"window_start".cast("string"), $"k", $"est")
        .as[(String, String, Long)].collect().sorted.toSeq
      assert(got == want, s"stream/batch divergence:\n$got\nvs\n$want")
    } finally q.stop()
  }
}
