package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interval join (batch): pairs rows inside the lookback, same key only") {
    val purchases = Seq((100L, 1L, "2024-01-01 10:00:00"))
      .toDF("purchase_id", "user_id", "p")
      .withColumn("p_ts", to_timestamp(col("p"))).drop("p")
    val clicks = Seq(
      (1L, "2024-01-01 09:51:00", 2.0),  // inside [09:50, 10:00]
      (1L, "2024-01-01 10:00:00", 3.0),  // boundary: inclusive
      (1L, "2024-01-01 09:49:59", 9.0),  // just before the window
      (1L, "2024-01-01 10:00:01", 9.0),  // after the purchase
      (2L, "2024-01-01 09:55:00", 9.0))  // other user
      .toDF("user_id", "c", "c_value")
      .withColumn("c_ts", to_timestamp(col("c"))).drop("c")
    val got = StreamJoin.intervalJoin(purchases, clicks, "user_id",
        "p_ts", "c_ts", "10 minutes")
      .select("purchase_id", "c_value").as[(Long, Double)]
      .collect().toSeq.sorted
    assert(got == Seq((100L, 2.0), (100L, 3.0)))
  }

  test("stream-stream interval join with watermarks emits matches across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, String, Double)]
    val purchases = pMem.toDF().toDF("purchase_id", "user_id", "p")
      .withColumn("p_ts", to_timestamp(col("p"))).drop("p")
    val clicks = cMem.toDF().toDF("user_id", "c", "c_value")
      .withColumn("c_ts", to_timestamp(col("c"))).drop("c")
    val joined = StreamJoin.intervalJoin(purchases, clicks, "user_id",
      "p_ts", "c_ts", "10 minutes", watermark = Some("1 minute"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // Clicks arrive first (buffered as state), purchase lands next batch.
      cMem.addData((1L, "2024-01-01 09:51:00", 2.0))
      cMem.addData((1L, "2024-01-01 09:58:00", 5.0))
      cMem.addData((2L, "2024-01-01 09:55:00", 9.0))
      q.processAllAvailable()
      pMem.addData((100L, 1L, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      val got = spark.table("sj_out").select("purchase_id", "c_value")
        .as[(Long, Double)].collect().toSeq.sorted
      assert(got == Seq((100L, 2.0), (100L, 5.0)))
    } finally q.stop()
  }

  test("left-outer stream-stream interval join emits the null row only after the watermark proves no match") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, String, Double)]
    val purchases = pMem.toDF().toDF("purchase_id", "user_id", "p")
      .withColumn("p_ts", to_timestamp(col("p"))).drop("p")
    val clicks = cMem.toDF().toDF("user_id", "c", "c_value")
      .withColumn("c_ts", to_timestamp(col("c"))).drop("c")
    val joined = StreamJoin.intervalJoin(purchases, clicks, "user_id",
      "p_ts", "c_ts", "10 minutes", watermark = Some("1 minute"),
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("sj_outer_out")
      .outputMode("append").start()
    try {
      // One purchase WITH an in-range click, one with none.
      cMem.addData((1L, "2024-01-01 09:51:00", 2.0))
      q.processAllAvailable()
      pMem.addData((100L, 1L, "2024-01-01 10:00:00"))
      pMem.addData((200L, 2L, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      // The match emits promptly; the unmatched purchase must NOT have
      // emitted yet — the watermark hasn't proven absence.
      val early = spark.table("sj_outer_out").select("purchase_id")
        .as[Long].collect().toSeq
      assert(early == Seq(100L),
        s"expected only the matched purchase before watermark closure, got $early")
      // Advance both watermarks far past 10:00 + lookback + delay.
      cMem.addData((9L, "2024-01-01 11:00:00", 0.0))
      pMem.addData((999L, 9L, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("sj_outer_out")
        .select($"purchase_id", $"c_value")
        .as[(Long, Option[Double])].collect().toSeq
      assert(got.contains((100L, Some(2.0))))
      assert(got.contains((200L, None)),
        s"unmatched purchase never emitted its null row: $got")
    } finally q.stop()
  }

  test("streaming left_outer without a watermark fails fast with the contract message") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, String, Double)]
    val purchases = pMem.toDF().toDF("purchase_id", "user_id", "p")
      .withColumn("p_ts", to_timestamp(col("p"))).drop("p")
    val clicks = cMem.toDF().toDF("user_id", "c", "c_value")
      .withColumn("c_ts", to_timestamp(col("c"))).drop("c")
    val err = intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(purchases, clicks, "user_id",
        "p_ts", "c_ts", "10 minutes", joinType = "left_outer")
    }
    assert(err.getMessage.contains("requires a watermark"),
      s"wrong failure: ${err.getMessage}")
    // Batch left_outer without a watermark stays legal (previous test), and
    // streaming INNER without a watermark is still constructible.
    StreamJoin.intervalJoin(purchases, clicks, "user_id",
      "p_ts", "c_ts", "10 minutes")
  }

  test("left-outer batch parity: unmatched left rows carry nulls") {
    val purchases = Seq((100L, 1L, "2024-01-01 10:00:00"),
        (200L, 2L, "2024-01-01 10:00:00"))
      .toDF("purchase_id", "user_id", "p")
      .withColumn("p_ts", to_timestamp(col("p"))).drop("p")
    val clicks = Seq((1L, "2024-01-01 09:51:00", 2.0))
      .toDF("user_id", "c", "c_value")
      .withColumn("c_ts", to_timestamp(col("c"))).drop("c")
    val got = StreamJoin.intervalJoin(purchases, clicks, "user_id",
        "p_ts", "c_ts", "10 minutes", joinType = "left_outer")
      .select($"purchase_id", $"c_value")
      .as[(Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((100L, Some(2.0)), (200L, None)))
  }
}
