package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.Salting
import StatefulOps.TradeEvent

class StatefulAndSaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("flatMapGroupsWithState running VWAP accumulates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TradeEvent]
    val out = StatefulOps.runningVwap(mem.toDS())
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("vwap_out").start()
    try {
      mem.addData(TradeEvent("AAA", 100.0, 1.0), TradeEvent("AAA", 110.0, 1.0),
        TradeEvent("BBB", 10.0, 2.0))
      q.processAllAvailable()
      val b1 = spark.sql("select * from vwap_out").as[StatefulOps.VwapUpdate]
        .collect().map(u => u.symbol -> u).toMap
      assert(b1("AAA").vwap == 105.0 && b1("AAA").n == 2)
      assert(b1("BBB").vwap == 10.0 && b1("BBB").cumQty == 2.0)

      // second batch folds into persisted state, not a fresh aggregate
      mem.addData(TradeEvent("AAA", 130.0, 2.0))
      q.processAllAvailable()
      val b2 = spark.sql("select * from vwap_out").as[StatefulOps.VwapUpdate]
        .collect().filter(_.symbol == "AAA").maxBy(_.n)
      assert(b2.n == 3 && b2.cumQty == 4.0)
      assert(math.abs(b2.vwap - (100.0 + 110.0 + 260.0) / 4.0) < 1e-12)
    } finally q.stop()
  }

  test("salted aggregation matches direct groupBy on skewed keys") {
    // 90% of rows share one hot key.
    val df = spark.range(10000)
      .withColumn("k", when(col("id") % 10 < 9, lit("hot")).otherwise(lit("cold")))
      .withColumn("v", col("id").cast("double"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Salting.saltedAgg(df.select("k", "v"), Seq("k"), buckets = 8,
      Seq(Salting.sumOf("v", "s"), Salting.countRows("n"),
          Salting.minOf("v", "mn"), Salting.maxOf("v", "mx")))
      .orderBy("k").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      == direct.map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
  }
}
