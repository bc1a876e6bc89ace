package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The dual-format timestamp sniffer (SURVEY §1.3/P8): epoch-ms numerics
  * and ISO strings in the same column must normalize identically. */
class TimeOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sniffs epoch millis vs ISO strings") {
    val df = Seq(
      "1704067200000",          // 2024-01-01 00:00:00 UTC as epoch ms
      "2024-01-01 00:00:00",    // same instant as ISO
      "2024-06-15 12:34:56"
    ).toDF("raw").withColumn("ts", TimeOps.tsMillisOrIso(col("raw")))
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as[String].collect()
    assert(got(0) == "2024-01-01 00:00:00")
    assert(got(1) == "2024-01-01 00:00:00")
    assert(got(2) == "2024-06-15 12:34:56")
  }

  test("property: ms and ISO renderings of the same instant agree") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(64)(100000000000L + (rnd.nextLong().abs % 4002444800000L))
      .map(ms => (ms / 1000L) * 1000L) // second resolution, 1973..2100
    val df = samples.map(_.toString).toDF("raw")
      .withColumn("iso", date_format(timestamp_millis(col("raw").cast("long")),
        "yyyy-MM-dd HH:mm:ss"))
      .select(TimeOps.tsMillisOrIso(col("raw")).as("from_ms"),
              TimeOps.tsMillisOrIso(col("iso")).as("from_iso"))
    assert(df.where(col("from_ms") =!= col("from_iso")).count() == 0)
  }

  test("epochSeconds/epochMicros agree across LTZ, NTZ and string inputs") {
    // unix_micros/unix_seconds throw DATATYPE_MISMATCH on TIMESTAMP_NTZ
    // (the round-7 q64/q68/q93 breakage); the helpers must accept both
    // timestamp types and return the same epoch under the UTC session.
    val df = Seq("2024-01-01 00:00:00.000001", "2031-06-15 12:34:56.789012")
      .toDF("raw")
      .select(to_timestamp(col("raw")).as("ltz"),
              col("raw").cast("timestamp_ntz").as("ntz"), col("raw"))
    val rows = df.select(
      TimeOps.epochMicros(col("ltz")), TimeOps.epochMicros(col("ntz")),
      TimeOps.epochMicros(col("raw")),
      TimeOps.epochSeconds(col("ltz")), TimeOps.epochSeconds(col("ntz")))
      .as[(Long, Long, Long, Long, Long)].collect()
    for ((mLtz, mNtz, mStr, sLtz, sNtz) <- rows) {
      assert(mLtz == mNtz && mNtz == mStr)
      assert(sLtz == sNtz && sLtz == mLtz / 1000000L)
    }
    assert(rows(0)._1 == 1704067200000001L) // µs precision survives
  }

  test("weekday num is 0=Monday and pairs with the name") {
    val df = Seq("2024-01-01 10:00:00").toDF("raw") // a Monday
      .withColumn("ts", to_timestamp(col("raw")))
    val row = df.select(TimeOps.weekdayNum(col("ts")), TimeOps.weekdayName(col("ts"))).head()
    assert(row.getInt(0) == 0 && row.getString(1) == "Monday")
  }
}
