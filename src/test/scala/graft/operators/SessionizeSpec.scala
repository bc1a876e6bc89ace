package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // user 1: events at 0, 100, 1899s (gaps 100, 1799 — one session),
  //         then 3699s (gap EXACTLY 1800 — still merges, native rule),
  //         then 5500s (gap 1801 — new session).
  // user 2: a single event (its own session).
  private val events = Seq(
    (1L, 10L, ts(0)), (1L, 11L, ts(100)), (1L, 12L, ts(1899)),
    (1L, 13L, ts(3699)), (1L, 14L, ts(5500)),
    (2L, 20L, ts(50))
  ).toDF("user_id", "event_id", "ts")

  test("gap of exactly gapSec merges; only strictly greater splits") {
    val got = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 4L, 3699L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("session bounds are the member events' min/max timestamps") {
    val row = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .where(col("user_id") === 1 && col("session_idx") === 1)
      .select("session_start", "session_end")
      .as[(Timestamp, Timestamp)].head()
    assert(row == (ts(0), ts(3699)))
  }

  test("assignSessions labels every event and is contiguous per user") {
    val labeled = Sessionize.assignSessions(events, "user_id", "ts", "event_id", 1800L)
    assert(labeled.count() == events.count())
    val idx = labeled.where(col("user_id") === 1)
      .orderBy("ts").select("session_idx").as[Long].collect().toSeq
    assert(idx == Seq(1L, 1L, 1L, 1L, 2L))
  }

  test("equal timestamps stay in one session and order by the tie column") {
    val dup = Seq((1L, 2L, ts(0)), (1L, 1L, ts(0)), (1L, 3L, ts(0)))
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessionStats(dup, "user_id", "ts", "event_id", 1800L)
      .select("session_idx", "n_events").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L)))
  }

  test("TIMESTAMP_NTZ input sessionizes identically to TimestampType") {
    val ntz = events.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val a = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_idx", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Sessionize.sessionStats(ntz, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_idx", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("one exchange: windows and the final aggregate reuse the user_id shuffle") {
    val df = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
    df.queryExecution.toRdd // finalize AQE
    // Count ONLY the final adaptive plan: the full toString repeats every
    // node under "== Initial Plan ==", double-counting the one exchange.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected ONE hash exchange (group key extends the window partition " +
        s"key), saw $exchanges:\n$plan")
  }

  test("an existing session_idx column is rejected") {
    val bad = events.withColumn("session_idx", lit(1))
    intercept[IllegalArgumentException] {
      Sessionize.assignSessions(bad, "user_id", "ts", "event_id", 1800L)
    }
  }
}
