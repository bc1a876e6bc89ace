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

  test("assignShard: deterministic, in-range, matches the md5 reference") {
    val df = (0L until 500L).toDF("id")
    val got = Splits.assignShard(df, col("id"), numShards = 16)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(got.size == 500)
    assert(got.values.forall(s => s >= 0 && s < 16))
    // Independent reference: first 8 hex chars of md5(id) mod 16 — the
    // cross-engine contract the DuckDB oracle mirrors.
    def ref(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 16
    }
    (0L until 500L).foreach(i => assert(got(i) == ref(i), s"id $i"))
  }

  test("assignShard: pure projection (no shuffle), uniform-ish load") {
    val df = (0L until 16000L).toDF("id")
    val sharded = Splits.assignShard(df, col("id"), numShards = 16)
    assert(!sharded.queryExecution.executedPlan.toString.contains("Exchange"))
    val counts = sharded.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 16)
    // Expected 1000/shard; ±25% is >8 sigma for a binomial(16000, 1/16).
    assert(counts.values.forall(c => c > 750 && c < 1250), counts)
  }

  test("assignShard: null id fails loudly, collisions with existing column rejected") {
    val ex = intercept[Exception] {
      Splits.assignShard(Seq(Some(1L), None).toDF("id"), col("id"), 4).collect()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      Splits.assignShard(Seq((1L, 2L)).toDF("id", "shard"), col("id"), 4)
    }
    intercept[IllegalArgumentException] {
      Splits.assignShard(Seq(1L).toDF("id"), col("id"), 0)
    }
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
