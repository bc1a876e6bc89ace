package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("bucketed token-budget sample is bit-identical to the naive window") {
    // Deterministic pseudo-random corpus: 3 strata, weights 0-99 INCLUDING
    // zeros (the __before == budget edge), ids dense so every md5 bucket
    // boundary shape occurs somewhere across the budget sweep.
    val rows = (0L until 2000L).map { i =>
      (i, s"s${i % 3}", (i * 2654435761L % 100).toInt)
    }
    val df = rows.toDF("id", "stratum", "w")
    for (budget <- Seq(0L, 1L, 500L, 7919L, 1000000L)) {
      val budgets = Seq(("s0", budget), ("s1", budget), ("s2", budget))
        .toDF("stratum", "budget")
      val fast = keptIds(Mixture.tokenBudgetSample(df, "stratum", col("w"),
        col("id"), budgets))
      val slow = keptIds(Mixture.tokenBudgetSampleNaive(df, "stratum", col("w"),
        col("id"), budgets))
      assert(fast == slow, s"budget=$budget: bucketed=${fast.size} naive=${slow.size}")
    }
  }

  test("budget semantics: running total inclusive of the current row") {
    // Single stratum, weights 10 each; md5 order of ids 0..9 decides who
    // fills a 35-token budget: exactly 3 rows fit (30 ≤ 35 < 40).
    val df = (0L until 10L).map(i => (i, "a", 10)).toDF("id", "stratum", "w")
    val budgets = Seq(("a", 35L)).toDF("stratum", "budget")
    val kept = Mixture.tokenBudgetSample(df, "stratum", col("w"), col("id"), budgets)
    assert(kept.count() == 3)
    // The 3 kept rows are the md5-smallest ids — the deterministic draw.
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val wantOrder = (0L until 10L).sortBy(i => md5Hex(i.toString)).take(3).toSet
    assert(keptIds(kept) == wantOrder)
  }

  test("no window node ever processes the giant stratum") {
    // 20k rows in ONE stratum: the naive formulation would stream all 20k
    // through a single Window task. In the bucketed path every WindowExec
    // (the ≤4096-row bucket cumsum AND the boundary-bucket-only per-row
    // window) must see a small fraction — the structural proof of the
    // skew-immunity claim, read off the executed plan's SQLMetrics.
    val n = 20000L
    val df = spark.range(n).select(col("id"), lit("web").as("stratum"),
      (col("id") % 7).as("w"))
    val budgets = Seq(("web", (3L * n) / 2)).toDF("stratum", "budget")
    val out = Mixture.tokenBudgetSample(df, "stratum", col("w"), col("id"), budgets)
    out.count() // populate metrics
    val windows = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // AQE can hide finished subtrees; walk adaptive nodes too.
    val adaptive = out.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
    }.flatten
    val all = windows ++ adaptive
    assert(all.nonEmpty, "expected WindowExec nodes in the bucketed plan")
    all.foreach { w =>
      val rows = w.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      assert(rows < n / 4,
        s"a window processed $rows of $n rows — the giant stratum leaked " +
          "into an unsplittable window task")
    }
  }

  test("strata without a budget row contribute nothing") {
    val df = Seq((1L, "a", 5), (2L, "b", 5)).toDF("id", "stratum", "w")
    val budgets = Seq(("a", 100L)).toDF("stratum", "budget")
    assert(keptIds(Mixture.tokenBudgetSample(df, "stratum", col("w"), col("id"),
      budgets)) == Set(1L))
  }

  test("reserved column names are rejected") {
    val df = Seq((1L, "a", 5)).toDF("id", "stratum", "__k")
    val budgets = Seq(("a", 100L)).toDF("stratum", "budget")
    intercept[IllegalArgumentException] {
      Mixture.tokenBudgetSample(df, "stratum", col("__k"), col("id"), budgets)
    }
  }
}
