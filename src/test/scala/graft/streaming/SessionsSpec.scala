package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.Sessionize

class SessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("batch parity: native session_window sessions == Sessionize.sessionStats") {
    // Mixed shapes: multi-event session, exact-gap split, singleton user.
    val events = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(100)), (1L, 12L, ts(1899)),
      (1L, 13L, ts(3699)), (1L, 14L, ts(6000)),
      (2L, 20L, ts(50))
    ).toDF("user_id", "event_id", "ts")
    val streamShape = Sessions.sessionAggregate(events, "user_id", "ts",
        "1800 seconds", "0 seconds")
      .select("user_id", "session_start", "session_end", "n_events", "duration_sec")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    val batch = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_start", "session_end", "n_events", "duration_sec")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(streamShape == batch)
  }

  test("streaming: sessions finalize exactly once when the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val sessions = Sessions.sessionAggregate(stream, "user_id", "ts",
      "30 minutes", "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // Two events 10 min apart: one open session for user 1.
      mem.addData((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0,
        "session emitted before the watermark passed its close")
      // An event far ahead advances the watermark beyond 00:40 + lateness,
      // closing user 1's session; user 9's own session stays open.
      mem.addData((9L, "2024-01-01 02:00:00"))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .select("user_id", "n_events", "duration_sec")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq((1L, 2L, 600L)))
    } finally q.stop()
  }

  test("streaming: late event within the watermark merges into its session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val sessions = Sessions.sessionAggregate(stream, "user_id", "ts",
      "30 minutes", "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      mem.addData((1L, "2024-01-01 00:00:00"))
      q.processAllAvailable()
      // Late arrival (event-time before max seen) but within lateness:
      // must merge, extending the session instead of starting a new row.
      mem.addData((1L, "2024-01-01 00:08:00"), (1L, "2024-01-01 00:04:00"))
      q.processAllAvailable()
      mem.addData((9L, "2024-01-01 03:00:00")) // close everything of user 1
      q.processAllAvailable()
      val got = spark.table("sessions_late")
        .select("user_id", "n_events", "duration_sec")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq((1L, 3L, 480L)))
    } finally q.stop()
  }
}
