package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long, micros: Long = 0): Timestamp = {
    val t = new Timestamp(sec * 1000L + micros / 1000)
    t.setNanos((micros % 1000000L).toInt * 1000)
    t
  }

  // left at t=1000s; window [t-100, t): matches 900..999.999..., not 1000
  private val left = Seq((1L, 10L, ts(1000)), (2L, 10L, ts(5000)), (3L, 99L, ts(1000)))
    .toDF("lid", "key", "lt")
  private val right = Seq(
    (100L, 10L, ts(900)),          // boundary: exactly lower → included
    (101L, 10L, ts(999, 999999)),  // just under upper → included
    (102L, 10L, ts(1000)),         // exactly upper → excluded
    (103L, 10L, ts(899, 999999)),  // just below lower → excluded
    (104L, 10L, ts(4950)),         // matches left 2
    (105L, 77L, ts(950))           // wrong key
  ).toDF("rid", "key", "rt")

  test("banded range join matches the naive range-join semantics exactly") {
    val got = RangeJoin.banded(left, right, Seq("key"), "lt", "rt", -100, 0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (1L, 101L), (2L, 104L)))
  }

  test("no duplicate pairs when the window crosses a bucket boundary") {
    // w=100 buckets at multiples of 100; left window [900,1000) sits exactly
    // on bucket 9; probes buckets 9 and 10 — each match must appear once.
    val got = RangeJoin.banded(left, right, Seq("key"), "lt", "rt", -100, 0)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    assert(got.size == got.toSet.size)
  }

  test("agrees with a plain range-join on a dense fixture") {
    val l = (0L until 50L).map(i => (i, i % 3, ts(1000 + i * 37))).toDF("lid", "key", "lt")
    val r = (0L until 200L).map(i => (i, i % 3, ts(980 + i * 11))).toDF("rid", "key", "rt")
    val banded = RangeJoin.banded(l, r, Seq("key"), "lt", "rt", -60, 30)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.join(r, l("key") === r("key") &&
        r("rt") >= l("lt") - expr("INTERVAL 60 SECONDS") &&
        r("rt") < l("lt") + expr("INTERVAL 30 SECONDS"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
  }

  test("inclusiveUpper admits the exact upper boundary, once") {
    // Same fixture, closed interval [lt-100, lt]: rid 102 (exactly lt) now
    // joins; boundary rows still appear exactly once despite the ×2 probe.
    val got = RangeJoin.banded(left, right, Seq("key"), "lt", "rt", -100, 0,
        inclusiveUpper = true)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    assert(got.toSet == Set((1L, 100L), (1L, 101L), (1L, 102L), (2L, 104L)))
    assert(got.size == got.toSet.size)
  }

  test("inclusiveUpper agrees with a plain closed-interval join on a dense fixture") {
    val l = (0L until 50L).map(i => (i, i % 3, ts(1000 + i * 37))).toDF("lid", "key", "lt")
    val r = (0L until 200L).map(i => (i, i % 3, ts(980 + i * 11))).toDF("rid", "key", "rt")
    val banded = RangeJoin.banded(l, r, Seq("key"), "lt", "rt", -60, 30,
        inclusiveUpper = true)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.join(r, l("key") === r("key") &&
        r("rt") >= l("lt") - expr("INTERVAL 60 SECONDS") &&
        r("rt") <= l("lt") + expr("INTERVAL 30 SECONDS"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
  }

  test("TIMESTAMP_NTZ inputs join identically to TimestampType inputs") {
    // The round-7 regression: driver testdata switched events.ts to parquet
    // timestamp[us] (→ NTZ in Spark 4), and the then-.cast("long") epoch
    // extraction was an illegal cast on NTZ. Epoch extraction now routes
    // through TimeOps.epochSeconds/epochMicros, which accept both; under
    // the UTC test session the NTZ re-interpretation is value-identical.
    val lNtz = left.withColumn("lt", col("lt").cast("timestamp_ntz"))
    val rNtz = right.withColumn("rt", col("rt").cast("timestamp_ntz"))
    val ltz = RangeJoin.banded(left, right, Seq("key"), "lt", "rt", -100, 0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    for ((l, r) <- Seq((lNtz, rNtz), (lNtz, right), (left, rNtz))) {
      val got = RangeJoin.banded(l, r, Seq("key"), "lt", "rt", -100, 0)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got == ltz)
    }
  }

  test("plans as a hash equi-join, not a nested-loop/cartesian") {
    val df = RangeJoin.banded(left, right, Seq("key"), "lt", "rt", -100, 0)
    df.queryExecution.toRdd // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected equi-join plan, got:\n$plan")
  }

  test("reserved column names are rejected on either side") {
    val lb = left.withColumn("__bucket", lit(1))
    val rb = right.withColumn("__bucket", lit(1))
    for ((l, r) <- Seq((lb, right), (left, rb))) {
      val ex = intercept[IllegalArgumentException] {
        RangeJoin.banded(l, r, Seq("key"), "lt", "rt", -100, 0)
      }
      assert(ex.getMessage.contains("__bucket"))
    }
    val ex2 = intercept[IllegalArgumentException] {
      RangeJoin.banded(left.withColumn("__r_x", lit(1)), right,
        Seq("key"), "lt", "rt", -100, 0)
    }
    assert(ex2.getMessage.contains("__r_"))
  }
}
