package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("re-delivered doc ids within the watermark are dropped across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "t", "text")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val deduped = StreamDedup.dedupWithinWatermark(stream, "ts", "10 minutes",
      Seq("doc_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "2024-01-01 00:00:00", "a"))
      mem.addData((2L, "2024-01-01 00:00:10", "b"))
      q.processAllAvailable()
      // Batch 2: one true re-delivery of id 1 (inside the horizon) and one
      // new id — only the new id must come through.
      mem.addData((1L, "2024-01-01 00:01:00", "a-dup"))
      mem.addData((3L, "2024-01-01 00:02:00", "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("doc_id").as[Long]
        .collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
