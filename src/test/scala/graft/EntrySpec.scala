package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() yields rows; every declared query runs on
  * sf0.001 and each oracleSql key has a matching query. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, SparkTestSession.sf)
      assert(df.columns.nonEmpty)
      df.count() // must not throw
    }
  }
}
