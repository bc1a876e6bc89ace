package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SplitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cuts = Seq(("train", 90), ("val", 95), ("test", 100))

  test("every row gets exactly one label from the cut set, deterministically") {
    val df = (0L until 2000L).toDF("id")
    val once = Splits.assignSplit(df, col("id"), cuts)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(once.size == 2000)
    assert(once.values.toSet.subsetOf(Set("train", "val", "test")))
    val again = Splits.assignSplit(df, col("id"), cuts)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(once == again)
  }

  test("split fractions track the cut percentages") {
    val df = (0L until 20000L).toDF("id")
    val byLabel = Splits.assignSplit(df, col("id"), cuts)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // md5 draws are uniform; at n=20k a ±3-point band is ~10 sigma.
    assert(byLabel("train") > 17400 && byLabel("train") < 18600, byLabel)
    assert(byLabel("val") > 400 && byLabel("val") < 1600, byLabel)
    assert(byLabel("test") > 400 && byLabel("test") < 1600, byLabel)
  }

  test("the label is a pure projection — no shuffle in the plan") {
    val df = (0L until 100L).toDF("id")
    val plan = Splits.assignSplit(df, col("id"), cuts)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("a null id fails loudly instead of flooding the last cut") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val ex = intercept[Exception] {
      Splits.assignSplit(df, col("id"), cuts).collect()
    }
    assert(ex.getMessage != null)
  }

  test("malformed cuts are rejected") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] { // must end at 100
      Splits.assignSplit(df, col("id"), Seq(("a", 50), ("b", 99)))
    }
    intercept[IllegalArgumentException] { // must strictly increase
      Splits.assignSplit(df, col("id"), Seq(("a", 60), ("b", 60), ("c", 100)))
    }
  }
}
