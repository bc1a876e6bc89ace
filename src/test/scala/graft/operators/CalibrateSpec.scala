package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Calibrate.histogramBuckets — the bounded-value-histogram quantile
  * assignment that replaces a per-group ntile window. */
class CalibrateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decile assignment matches the per-row rank formula") {
    // Deterministic pseudo-random scores on a bounded [0, 100] scale,
    // two groups of different sizes.
    val df = (0 until 500).map { i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, (i * 37 % 101).toLong)
    }.toDF("g", "id", "score")
    val got = Calibrate.histogramBuckets(df, Seq("g"), "score", 10, "decile")
    // Reference: bucket = least(9, 10 * (rank-1) div n) via per-row window.
    val ref = df
      .withColumn("__r", rank().over(Window.partitionBy("g").orderBy("score")) - 1)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("decile", least(lit(9), expr("(10 * __r) div __n")))
      .select("g", "id", "score", "decile")
    assert(got.select("g", "id", "score", "decile").except(ref).isEmpty &&
      ref.except(got.select("g", "id", "score", "decile")).isEmpty)
  }

  test("ties share a bucket and buckets stay within [0, buckets)") {
    // 20 rows, only 3 distinct values: every tie group must land whole.
    val df = (0 until 20).map(i => ("g", i.toLong, (i % 3).toLong))
      .toDF("g", "id", "v")
    val out = Calibrate.histogramBuckets(df, Seq("g"), "v", 4, "b")
    val byValue = out.groupBy("v").agg(count_distinct(col("b")).as("nb"),
      min("b").as("mn"), max("b").as("mx")).collect()
    assert(byValue.forall(_.getLong(1) == 1L), "a tie group split across buckets")
    assert(out.agg(min("b"), max("b")).as[(Long, Long)].head() match {
      case (mn, mx) => mn >= 0 && mx <= 3
    })
  }

  test("single bucket and more buckets than rows degrade sanely") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 9L)).toDF("g", "id", "v")
    assert(Calibrate.histogramBuckets(df, Seq("g"), "v", 1, "b")
      .select("b").distinct().as[Long].collect().toSeq == Seq(0L))
    // buckets=100 over 2 rows: ranks 0 and 1 of n=2 → buckets 0 and 50.
    assert(Calibrate.histogramBuckets(df, Seq("g"), "v", 100, "b")
      .orderBy("id").select("b").as[Long].collect().toSeq == Seq(0L, 50L))
  }

  test("bucket dim joins broadcast — rows never shuffle for the join") {
    val df = (0 until 100).map(i => ("g", i.toLong, (i % 7).toLong))
      .toDF("g", "id", "v")
    val plan = Calibrate.histogramBuckets(df, Seq("g"), "v", 10, "b")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the histogram dim to broadcast, got:\n$plan")
  }

  test("reserved output column and bad bucket count are rejected") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Calibrate.histogramBuckets(df.withColumn("b", lit(1)), Seq("g"), "v", 10, "b")
    }
    intercept[IllegalArgumentException] {
      Calibrate.histogramBuckets(df, Seq("g"), "v", 0, "b")
    }
  }

  test("nearestRankCuts matches the sort-based nearest-rank definition") {
    // Values 1..100 in group a (P5 = 5, P95 = 95 under nearest-rank);
    // a small tied group b where cuts land on the tie value.
    val df = ((1 to 100).map(v => ("a", v.toLong)) ++
      Seq.fill(10)(("b", 7L)) ++ Seq(("b", 9L))).toDF("g", "v")
    val got = Calibrate.nearestRankCuts(df, Seq("g"), "v", Seq(5, 50, 95))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    // group b: n=11 → rank ceil(5·11/100)=1 → 7; ceil(50·11/100)=6 → 7;
    // ceil(95·11/100)=11 → 9.
    assert(got == Seq(("a", 5L, 50L, 95L), ("b", 7L, 7L, 9L)), got.toString)
    // cross-check every cut against an explicit sorted-seq nearest-rank
    val byG = df.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for ((g, p5, p50, p95) <- got; (p, want) <- Seq(5 -> p5, 50 -> p50, 95 -> p95)) {
      val xs = byG(g)
      val r = math.ceil(p * xs.length / 100.0).toInt.max(1)
      assert(xs(r - 1) == want, s"group $g P$p: got $want want ${xs(r - 1)}")
    }
  }

  test("nearestRankCuts rejects out-of-range percents") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Calibrate.nearestRankCuts(df, Seq("g"), "v", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Calibrate.nearestRankCuts(df, Seq("g"), "v", Seq.empty)
    }
  }
}
