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
